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


def positional_encoding_fast(position: jnp.ndarray, n_freq: int = 10,
                             base_freq: float = float(np.pi)) -> jnp.ndarray:
    """`positional_encoding` with one sin/cos pair per channel.

    The octaves are 2^k multiples of the base frequency, so every higher
    octave follows from the base pair by the double-angle recurrence
    (sin 2x = 2 sin x cos x, cos 2x = 1 - 2 sin^2 x) — ~4 VPU mul/adds per
    octave instead of a transcendental pair. On TPU the transcendental
    evaluation dominates the serving-path geometry head (~9.5 ms of a 17.5 ms
    stage at 524k queries, tools/bench_swg.py SWG_BREAKDOWN=1); this form is
    ~n_freq x cheaper. Error accumulates one rounding per doubling
    (~1e-5 relative at n_freq=10 in f32) — used on the serving path, while
    training/parity paths keep the exact `positional_encoding`.
    """
    x = position * jnp.asarray(base_freq, position.dtype)
    s = jnp.sin(x)
    c = jnp.cos(x)
    sins = [s]
    coss = [c]
    for _ in range(n_freq - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sins.append(s)
        coss.append(c)
    # (..., D, n_freq, 2) flattened as (d n f) like the reference
    enc = jnp.stack([jnp.stack(sins, axis=-1), jnp.stack(coss, axis=-1)],
                    axis=-1)
    return enc.reshape(position.shape[:-1]
                       + (position.shape[-1] * n_freq * 2,))
