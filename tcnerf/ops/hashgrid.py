"""Multiresolution hash-grid encoding (instant-NGP style).

The upgrade path named in BASELINE.json config 4 ("hash-grid neural
grasp/feature field"): a learned positional encoding that replaces/augments
Fourier features for the grasp-energy field. Implemented as pure jnp —
per-level spatial hashing + 8-corner trilinear interpolation, all gathers
batched per level so XLA lowers each to one dynamic-gather; table sizes are
chosen to fit VMEM (2^14 x 2 per level) so the gathers stay on-chip.

API: params = init_hash_params(key, cfg); features = hash_encode(params, x, cfg)
with x normalized to the unit cube by `bounds`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)  # instant-NGP spatial-hash primes (uint32)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    table_size_log2: int = 14
    features_per_level: int = 2
    base_resolution: int = 16
    finest_resolution: int = 512
    bounds: Tuple[Tuple[float, float], ...] = (
        (0.35, 0.85), (-0.25, 0.25), (0.0, 0.2))

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.features_per_level

    def level_scales(self):
        if self.n_levels == 1:
            return jnp.asarray([float(self.base_resolution)])
        growth = (self.finest_resolution / self.base_resolution) ** (
            1.0 / (self.n_levels - 1))
        return self.base_resolution * growth ** jnp.arange(self.n_levels)


def init_hash_params(key, cfg: HashGridConfig):
    """[n_levels, 2^T, F] uniform in +-1e-4 (instant-NGP init)."""
    return jax.random.uniform(
        key, (cfg.n_levels, 2 ** cfg.table_size_log2, cfg.features_per_level),
        minval=-1e-4, maxval=1e-4)


def _hash(coords, table_size: int):
    """Spatial hash of integer corner coords [..., 3] -> [...] in [0, T)."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (c[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (c[..., 2] * jnp.uint32(_PRIMES[2]))
    return jnp.remainder(h, jnp.uint32(table_size)).astype(jnp.int32)


def hash_encode(tables, x, cfg: HashGridConfig):
    """Encode points x [..., 3] -> [..., n_levels * F]."""
    bounds = jnp.asarray(cfg.bounds)
    u = (x - bounds[:, 0]) / (bounds[:, 1] - bounds[:, 0])
    u = jnp.clip(u, 0.0, 1.0)

    shape = x.shape[:-1]
    flat = u.reshape(-1, 3)
    scales = cfg.level_scales()
    table_size = 2 ** cfg.table_size_log2

    # corner offsets [8, 3]
    offsets = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        dtype=jnp.int32)

    def level(table, scale):
        p = flat * scale
        p0 = jnp.floor(p).astype(jnp.int32)         # [N, 3]
        frac = p - p0                                # [N, 3]
        corners = p0[:, None, :] + offsets[None]     # [N, 8, 3]
        idx = _hash(corners, table_size)             # [N, 8]
        feats = table[idx]                           # [N, 8, F]
        w = jnp.prod(
            jnp.where(offsets[None].astype(frac.dtype) > 0,
                      frac[:, None, :], 1.0 - frac[:, None, :]),
            axis=-1)                                 # [N, 8]
        return jnp.sum(feats * w[..., None], axis=1)  # [N, F]

    # levels run SEQUENTIALLY (lax.map == scan): vmapping them materializes
    # every level's [N, 8, ...] corner/gather temporaries at once — at
    # serving shapes (N = rays x 192 samples) that exhausted HBM. The scan
    # bounds the live set to one level's temporaries; output identical.
    encoded = jax.lax.map(lambda ts: level(*ts), (tables, scales))  # [L,N,F]
    encoded = jnp.moveaxis(encoded, 0, 1)                           # [N,L,F]
    return encoded.reshape(shape + (cfg.out_dim,))
