"""Normalization layers.

`BatchStatNorm` normalizes with the *current batch* statistics and learned
scale/offset, with no running-average state. Rationale: the reference calls
its conv-path BatchNorm with training=True unconditionally
(src/lib/mvnerf/layers.py:23,27), so batch statistics are what the trained
network actually saw; the moving averages its inference path would consume are
either never read or zero-initialized by the weight converter
(nerf_utils.py:232-233). A stateless batch-stat norm reproduces the trained
behavior exactly while keeping the whole model pure-functional (no mutable
batch_stats collection threading through jit).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchStatNorm(nn.Module):
    epsilon: float = 1e-3  # keras BatchNormalization default
    dtype: Optional[jnp.dtype] = None
    reduction_axes: Optional[Tuple[int, ...]] = None  # default: all but last

    @nn.compact
    def __call__(self, x):
        axes = self.reduction_axes or tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
