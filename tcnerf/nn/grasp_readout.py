"""Grasp energy readout head.

Behavior parity with reference src/lib/grasp_mvnerf/layers.py:8-32 (relu/elu,
glorot, bias configurable) and src/lib/delta_ngf/layers.py:8-42 (elu +
he_normal variant selected via kernel_initializer='he_normal').

Input: the last four activations of the fused NeRF MLP, each [B, N, P, H]
(N poses, P probe points, H hidden). Per-activation Dense(64) downscales,
concat -> Dense(64) -> flatten probes (P*64) -> 2 residual blocks -> scalar.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .blocks import ResNetMLPBlock, Readout, _activation, _kernel_init


class GraspReadout(nn.Module):
    use_bias: bool = True
    activation: str = "relu"
    kernel_initializer: str = "glorot_uniform"
    activation_downscale: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, activations: Sequence[jnp.ndarray],
                 extra: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        act = _activation(self.activation)
        init = _kernel_init(self.kernel_initializer)
        ds = []
        for i, a in enumerate(activations[:4]):
            ds.append(act(nn.Dense(self.activation_downscale, kernel_init=init,
                                   dtype=self.dtype, name=f"activation_downscale_{i + 1}")(a)))
        if extra is not None:
            # auxiliary per-probe feature stream (e.g. the hash-grid encoding
            # of probe positions, BASELINE config 4); gets its own downscale
            # so the param tree only grows when the stream is enabled
            ds.append(act(nn.Dense(self.activation_downscale, kernel_init=init,
                                   dtype=self.dtype,
                                   name="activation_downscale_extra")(extra)))
        combined = jnp.concatenate(ds, axis=-1)
        combined = act(nn.Dense(64, dtype=self.dtype,
                                name="combined_activation_downscale")(combined))
        # [B, N, P, 64] -> [B, N, P*64]
        combined = combined.reshape(combined.shape[:-2] + (-1,))
        x = ResNetMLPBlock(128, 64, transform_shortcut=True, activation=self.activation,
                           kernel_initializer=self.kernel_initializer, dtype=self.dtype,
                           name="readout_block_0")(combined)
        x = ResNetMLPBlock(64, 64, activation=self.activation,
                           kernel_initializer=self.kernel_initializer, dtype=self.dtype,
                           name="readout_block_1")(x)
        out = Readout(1, use_bias=self.use_bias,
                      kernel_initializer=self.kernel_initializer, dtype=self.dtype,
                      name="readout_head")(x)
        return out[..., 0]
