"""NeRF embedding MLPs with mid-network multi-view mean fusion.

Behavior parity with reference src/lib/mvnerf/layers.py:301-379. The input
layout is view-major: leading axis is (batch * n_views); after the per-view
"feature" blocks the activations are mean-reduced over the view axis and the
"fusion" blocks continue on the fused stream, broadcast back over views only
implicitly (the fused tensor has leading axis `batch`).

TPU note: all trailing dims are the MLP hidden width (128) so every Dense here
is one MXU matmul over rows = (batch*views*rays*samples); no reshaping between
layers is needed and XLA fuses the residual adds into the matmul epilogues.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core.encoding import positional_encoding
from .blocks import ResNetMLPBlock


class SliceableDense(nn.Module):
    """Drop-in replacement for ``nn.Dense`` (identical param tree {kernel,
    bias}, identical initializers, identical dtype promotion) that exposes the
    kernel split at row ``split``:

      * ``project_tail(img)`` applies the FEATURE slice of the kernel (rows
        [split:], no bias) to a full-resolution feature image BEFORE the
        bilinear gather — valid because gather/lerp and matmul are both linear
        and commute;
      * ``apply_head(x)`` applies the pos/dir-encoding slice (rows [:split])
        plus the bias to the per-sample encodings.

    ``apply_head(enc) + lerp(gather(project_tail(img)))`` equals
    ``__call__(concat([enc, lerp(gather(img))]))`` up to matmul/lerp
    reassociation. Pre-projecting shrinks the gathered rows from the raw
    feature width to ``features`` (the MLP hidden width), cutting the
    row-gather bytes ~2x (docs/perf_notes.md).
    """

    features: int
    in_features: int
    split: int
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.features,), jnp.float32)

    def __call__(self, x):
        x, k, b = nn.dtypes.promote_dtype(x, self.kernel, self.bias,
                                          dtype=self.dtype)
        return x @ k + b

    def project_tail(self, images):
        img, k = nn.dtypes.promote_dtype(images, self.kernel[self.split:],
                                         dtype=self.dtype)
        return img @ k

    def apply_head(self, x):
        x, k, b = nn.dtypes.promote_dtype(x, self.kernel[:self.split],
                                          self.bias, dtype=self.dtype)
        return x @ k + b


class ResNetMLPEmbedding(nn.Module):
    """Single-view NeRF MLP (reference layers.py:301-331)."""

    n_blocks: int = 6
    hidden_size: int = 128
    n_freq: int = 10
    pos_encoding_freq: float = float(np.pi)
    embed_direction_vector: bool = False
    complete_output: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, positions, directions, features):
        encoded_pos = positional_encoding(positions, self.n_freq, self.pos_encoding_freq)
        encoded_dir = (
            positional_encoding(directions, self.n_freq, self.pos_encoding_freq)
            if self.embed_direction_vector else directions
        )
        x = jnp.concatenate([encoded_pos, encoded_dir, features], axis=-1)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="layer_0")(x)
        outputs = [x]
        for i in range(self.n_blocks):
            outputs.append(
                ResNetMLPBlock(self.hidden_size, self.hidden_size, dtype=self.dtype,
                               name=f"block_{i}")(outputs[-1])
            )
        return outputs if self.complete_output else outputs[-1]


class MVResNetMLPEmbedding(nn.Module):
    """Multi-view NeRF MLP with mean fusion (reference layers.py:334-379).

    Input tensors have leading axis (batch * n_views); `complete_output=True`
    returns the full activation list
    [layer0, feat_1..feat_k, fused_mean, fusion_1..fusion_m] — the grasp heads
    consume entries [4:] of this list (reference grasp_mvnerf/model.py:155).
    """

    n_blocks: int = 6
    hidden_size: int = 128
    n_views: int = 2
    n_freq: int = 10
    pos_encoding_freq: float = float(np.pi)
    embed_direction_vector: bool = False
    complete_output: bool = False
    # static width of the raw per-sample feature vector (e.g. n_features + 3
    # RGB). When set, layer_0 becomes a SliceableDense and the caller may
    # pre-project the full-res feature image via `project_image` and pass the
    # gathered result with features_projected=True. Param tree is unchanged.
    n_input_features: Optional[int] = None
    # run the residual-block chains as the fused Pallas TPU kernel (all
    # weights + hidden stream VMEM-resident, one HBM read/write per row —
    # ops/pallas/resmlp.py; ~1.45x over the XLA chain at bench scale).
    # Differentiable: backward remats through the jnp reference
    # (resmlp_rows_diff), so training may enable it too. init and
    # complete_output fall back to the jnp path.
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        pd = 6 * self.n_freq + (6 * self.n_freq
                                if self.embed_direction_vector else 3)
        if self.n_input_features is not None:
            self.layer_0 = SliceableDense(
                features=self.hidden_size,
                in_features=pd + self.n_input_features, split=pd,
                dtype=self.dtype)
        else:
            self.layer_0 = nn.Dense(self.hidden_size, dtype=self.dtype)
        n_feature_blocks = self.n_blocks // 2
        self.feature_blocks = [
            ResNetMLPBlock(self.hidden_size, self.hidden_size, dtype=self.dtype,
                           name=f"feature_block_{i}")
            for i in range(n_feature_blocks)
        ]
        self.fusion_blocks = [
            ResNetMLPBlock(self.hidden_size, self.hidden_size, dtype=self.dtype,
                           name=f"fusion_block_{i}")
            for i in range(self.n_blocks - n_feature_blocks)
        ]

    def encode_pos_dir(self, positions, directions):
        encoded_pos = positional_encoding(positions, self.n_freq,
                                          self.pos_encoding_freq)
        encoded_dir = (
            positional_encoding(directions, self.n_freq, self.pos_encoding_freq)
            if self.embed_direction_vector else directions
        )
        return jnp.concatenate([encoded_pos, encoded_dir], axis=-1)

    def project_image(self, images):
        """Apply layer_0's feature-kernel slice to a full-res [.., C] image
        (pre-gather; requires n_input_features). Returns [.., hidden_size]."""
        return self.layer_0.project_tail(images)

    def __call__(self, positions, directions, features,
                 features_projected: bool = False):
        enc = self.encode_pos_dir(positions, directions)
        if features_projected:
            head = self.layer_0.apply_head(enc)
            x = head + features.astype(head.dtype)
        else:
            x = self.layer_0(jnp.concatenate([enc, features], axis=-1))
        if (self.use_pallas and not self.complete_output
                and not self.is_initializing()):
            return self._pallas_chain(x)

        outputs = [x]
        for block in self.feature_blocks:
            outputs.append(block(outputs[-1]))

        pre = outputs[-1]
        fused = pre.reshape((-1, self.n_views) + pre.shape[1:]).mean(axis=1)
        outputs.append(fused)

        for block in self.fusion_blocks:
            outputs.append(block(outputs[-1]))
        return outputs if self.complete_output else outputs[-1]

    def _pallas_chain(self, x):
        """Both residual-block halves as fused VMEM-resident Pallas kernels,
        with the mean view-fusion between them. Same math as the jnp path
        (kernel parity-tested in tests/test_kernels.py); hidden stream
        accumulates in f32 inside the kernel. Differentiable via
        resmlp_rows_diff (remat-jnp backward)."""
        from ..ops.pallas.resmlp import resmlp_rows_diff as resmlp_rows

        dt = x.dtype

        def flat(blocks):
            out = []
            for blk in blocks:
                p = blk.variables["params"]
                out += [p["layer_0"]["kernel"].astype(dt),
                        p["layer_0"]["bias"].astype(dt),
                        p["layer_1"]["kernel"].astype(dt),
                        p["layer_1"]["bias"].astype(dt)]
            return tuple(out)

        shape = x.shape
        # positional args: custom_vjp with nondiff_argnums forbids keywords
        # (x, weights, n_blocks, readout, activation, tile, skip_input)
        h1 = resmlp_rows(x.reshape(-1, shape[-1]), flat(self.feature_blocks),
                         len(self.feature_blocks), False, "relu", 1024, True)
        h1 = h1.reshape(shape)
        fused = h1.reshape((-1, self.n_views) + shape[1:]).mean(axis=1)
        h2 = resmlp_rows(fused.reshape(-1, shape[-1]),
                         flat(self.fusion_blocks),
                         len(self.fusion_blocks), False, "relu", 1024, True)
        return h2.reshape(fused.shape)
