"""Dense residual building blocks and readout heads (flax.linen).

Behavior parity with reference src/lib/mvnerf/layers.py:262-411. Matmuls run at
the default (fast/bf16) precision — these are the MXU hot path; accumulation is
forced to f32 via Dense's default promotion.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def _activation(name: str):
    if name == "relu":
        return nn.relu
    if name == "elu":
        return nn.elu
    raise ValueError(f"activation {name} not supported")


def _kernel_init(name: str):
    if name == "glorot_uniform":
        return nn.initializers.glorot_uniform()
    if name == "he_normal":
        return nn.initializers.he_normal()
    raise ValueError(f"kernel initializer {name} not supported")


class ResNetMLPBlock(nn.Module):
    """Pre-activation dense residual block (reference layers.py:262-298)."""

    hidden_size: int
    output_size: int
    transform_shortcut: bool = False
    activation: str = "relu"
    kernel_initializer: str = "glorot_uniform"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = _activation(self.activation)
        init = _kernel_init(self.kernel_initializer)
        residual = act(x)
        residual = nn.Dense(self.hidden_size, kernel_init=init, dtype=self.dtype,
                            name="layer_0")(residual)
        residual = act(residual)
        residual = nn.Dense(self.output_size, kernel_init=init, dtype=self.dtype,
                            name="layer_1")(residual)
        if self.transform_shortcut:
            shortcut = nn.Dense(self.output_size, use_bias=False, kernel_init=init,
                                dtype=self.dtype, name="shortcut")(x)
        else:
            shortcut = x
        return shortcut + residual


class RenderReadout(nn.Module):
    """relu -> Dense(4) -> (sigmoid RGB, softplus sigma). Reference layers.py:382-397."""

    output_size: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        out = nn.Dense(self.output_size, dtype=self.dtype, name="output_layer")(nn.relu(x))
        chromacity = nn.sigmoid(out[..., :3])
        density = nn.softplus(out[..., 3])
        return chromacity, density


class Readout(nn.Module):
    """relu -> Dense(out). Reference layers.py:400-411."""

    output_size: int
    use_bias: bool = True
    kernel_initializer: str = "glorot_uniform"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.output_size, use_bias=self.use_bias,
                        kernel_init=_kernel_init(self.kernel_initializer),
                        dtype=self.dtype, name="output_layer")(nn.relu(x))
