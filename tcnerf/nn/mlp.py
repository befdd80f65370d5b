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
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, positions, directions, features):
        n_feature_blocks = self.n_blocks // 2
        n_fusion_blocks = self.n_blocks - n_feature_blocks

        encoded_pos = positional_encoding(positions, self.n_freq, self.pos_encoding_freq)
        encoded_dir = (
            positional_encoding(directions, self.n_freq, self.pos_encoding_freq)
            if self.embed_direction_vector else directions
        )
        x = jnp.concatenate([encoded_pos, encoded_dir, features], axis=-1)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="layer_0")(x)
        outputs = [x]
        for i in range(n_feature_blocks):
            outputs.append(
                ResNetMLPBlock(self.hidden_size, self.hidden_size, dtype=self.dtype,
                               name=f"feature_block_{i}")(outputs[-1])
            )

        pre = outputs[-1]
        fused = pre.reshape((-1, self.n_views) + pre.shape[1:]).mean(axis=1)
        outputs.append(fused)

        for i in range(n_fusion_blocks):
            outputs.append(
                ResNetMLPBlock(self.hidden_size, self.hidden_size, dtype=self.dtype,
                               name=f"fusion_block_{i}")(outputs[-1])
            )
        return outputs if self.complete_output else outputs[-1]
