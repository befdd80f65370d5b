"""Hash-grid NeRF field: multiresolution hash encoding + small MLP.

The beyond-reference "fast field" named in BASELINE.json config 4. The
reference's per-sample field is a 6-block 128-wide ResNet-MLP over projected
per-view image features (src/lib/mvnerf/layers.py:334-379) — ~491 kFLOP per
sample, which caps single-chip serving at the measured ~350-380k rays/s
composed floor (docs/perf_notes.md). This field replaces it with an
instant-NGP-style learned encoding (ops/hashgrid.py: per-level spatial hash +
trilinear interpolation, tables sized for VMEM) feeding a 3-layer 64-wide
MLP — ~21 kFLOP per sample, 23x less chain compute — at the cost of being a
per-scene field (no cross-scene generalization via image conditioning).

Drop-in for `MVResNetMLPEmbedding` at the renderer level
(models/renderer.py `field="hashgrid"`): same (positions, directions) ->
embedding contract, same RenderReadout afterwards, same per-component
checkpoint layout (the tables live inside `coarse_embedding` /
`fine_embedding`). Second-order differentiable (hash_encode is polynomial in
the table entries), so it also serves the DeltaNGF energy path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.hashgrid import HashGridConfig, hash_encode, init_hash_params


class HashGridField(nn.Module):
    n_levels: int = 16
    table_size_log2: int = 14
    features_per_level: int = 2
    base_resolution: int = 16
    finest_resolution: int = 512
    # axis-aligned scene bounds; points clamp to the box (empty space along
    # rays outside it hashes to boundary cells, which learn ~zero density)
    bounds: Tuple[Tuple[float, float], ...] = (
        (-0.2, 1.2), (-0.8, 0.8), (-0.4, 1.0))
    hidden_size: int = 64
    n_layers: int = 3
    dtype: Optional[jnp.dtype] = None

    @property
    def cfg(self) -> HashGridConfig:
        return HashGridConfig(
            n_levels=self.n_levels, table_size_log2=self.table_size_log2,
            features_per_level=self.features_per_level,
            base_resolution=self.base_resolution,
            finest_resolution=self.finest_resolution, bounds=self.bounds)

    @nn.compact
    def __call__(self, positions, directions, features=None,
                 features_projected: bool = False):
        """positions/directions [..., 3] -> embedding [..., hidden_size].

        `features`/`features_projected` are accepted (and ignored) so the
        renderer's `_field` can call any embedding flavor uniformly.
        """
        cfg = self.cfg
        tables = self.param("hash_tables",
                            lambda key: init_hash_params(key, cfg))
        enc = hash_encode(tables, positions, cfg)
        x = jnp.concatenate([enc, directions.astype(enc.dtype)], axis=-1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i in range(self.n_layers):
            x = nn.Dense(self.hidden_size, dtype=self.dtype,
                         name=f"layer_{i}")(x)
            x = nn.relu(x)
        return x
