"""Alpha compositing (volumetric rendering).

Reference semantics: src/lib/mvnerf/model_v0.py:89-100 and
src/lib/mvnerf/nerf_utils.py:129-140.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigma_to_alpha(sigma: jnp.ndarray, dists: jnp.ndarray) -> jnp.ndarray:
    """alpha = 1 - exp(-dist * relu(sigma))."""
    return 1.0 - jnp.exp(-dists * jax.nn.relu(sigma))


def volumetric_render(zs: jnp.ndarray, density: jnp.ndarray, chromacity: jnp.ndarray):
    """Composite per-sample (density, rgb) along each ray.

    zs/density: [B, R, S]; chromacity: [B, R, S, 3].
    Returns (rgb [B, R, 3], depth [B, R], weights [B, R, S]).

    The exclusive cumulative product of transmittance uses an associative scan
    (XLA lowers jnp.cumprod to a log-depth parallel prefix on the VPU).
    """
    dists = zs[..., 1:] - zs[..., :-1]
    dists = jnp.concatenate([dists, dists[..., -1:]], axis=-1)
    alpha = sigma_to_alpha(density, dists)
    one_minus = 1.0 - alpha + 1e-10
    transmittance = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(one_minus[..., :1]), one_minus[..., :-1]], axis=-1),
        axis=-1,
    )
    weights = alpha * transmittance
    rgb = jnp.sum(weights[..., None] * chromacity, axis=-2)
    depth = jnp.sum(weights * zs, axis=-1)
    return rgb, depth, weights
