"""Positional (Fourier feature) encoding.

Reference semantics: src/lib/mvnerf/nerf_utils.py:108-126 — per input channel d,
per octave n, the flattened output interleaves as (d, n, [sin, cos]).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def positional_encoding(position: jnp.ndarray, n_freq: int = 10,
                        base_freq: float = float(np.pi)) -> jnp.ndarray:
    """Encode (..., D) -> (..., D * n_freq * 2).

    Output ordering matches the reference flatten `(d n f)`:
    [sin(d0*f0), cos(d0*f0), sin(d0*f1), ..., sin(d1*f0), ...].
    """
    freqs = base_freq * (2.0 ** jnp.arange(n_freq, dtype=position.dtype))
    scaled = position[..., None] * freqs  # (..., D, n_freq)
    enc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)  # (..., D, n_freq, 2)
    return enc.reshape(position.shape[:-1] + (position.shape[-1] * n_freq * 2,))
