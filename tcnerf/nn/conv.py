"""Convolutional half-resolution image encoder.

Behavior parity with reference src/lib/mvnerf/layers.py:7-57. Reference quirks
reproduced deliberately:
  * each residual block uses ONE shared norm applied after both convs
    (`norm_1` is assigned twice in the reference, layers.py:11-14);
  * norms always use batch statistics (training=True hardcoded,
    layers.py:23-27) — see tcnerf.nn.norm.BatchStatNorm.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .norm import BatchStatNorm


class ConvResBlock(nn.Module):
    """2x conv3x3 residual block with one shared batch-stat norm."""

    n_features: int
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        norm = BatchStatNorm(dtype=self.dtype, name="norm_1")
        out = nn.Conv(self.n_features, (3, 3), padding="SAME", dtype=self.dtype,
                      name="conv_1")(x)
        out = nn.relu(norm(out))
        out = nn.Conv(self.n_features, (3, 3), padding="SAME", dtype=self.dtype,
                      name="conv_2")(out)
        out = norm(out)
        if self.downsample:
            skip = nn.Conv(self.n_features, (1, 1), use_bias=False, dtype=self.dtype,
                           name="downsample_conv")(x)
            skip = BatchStatNorm(dtype=self.dtype, name="downsample_norm")(skip)
        else:
            skip = x
        return nn.relu(out + skip)


class ConvolutionalEncoder(nn.Module):
    """conv7x7/2 stem + 3 residual blocks -> half-res, n_features//2 channels."""

    n_features: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(BatchStatNorm(dtype=self.dtype, name="stem_norm")(x))
        x = ConvResBlock(self.n_features // 2, downsample=True, dtype=self.dtype,
                         name="block_0")(x)
        x = ConvResBlock(self.n_features // 2, dtype=self.dtype, name="block_1")(x)
        x = ConvResBlock(self.n_features // 2, dtype=self.dtype, name="block_2")(x)
        return x
