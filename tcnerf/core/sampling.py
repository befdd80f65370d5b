"""Stratified and hierarchical (PDF inversion) sampling along rays.

Reference semantics: src/lib/mvnerf/nerf_utils.py:49-61 (stratified) and
:143-176 (CDF inversion). The reference inverts the CDF with a `tf.scan`
counting pass; here it is a single vectorized compare-and-sum, which XLA maps
onto the VPU as one fused reduction (identical integer result).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_along_ray(key: jax.Array, rays_origin: jnp.ndarray, rays_direction: jnp.ndarray,
                     near: float, far: float, n_samples: int):
    """Stratified sampling: uniform bins over [near, far) with per-bin jitter.

    rays_origin/rays_direction: [B, R, 3]. Returns
    (world_points [B, R, S, 3], z_along_ray [B, R, S]).
    """
    b, r = rays_origin.shape[0], rays_origin.shape[1]
    step = (far - near) / n_samples
    lower = near + step * jnp.arange(n_samples, dtype=rays_origin.dtype)
    jitter = jax.random.uniform(key, (b, r, n_samples), dtype=rays_origin.dtype) * step
    z = lower[None, None, :] + jitter
    world_points = rays_origin[:, :, None, :] + z[..., None] * rays_direction[:, :, None, :]
    return world_points, z


def _select_last(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table: [..., K]; idx: [..., S] int32 in [0, K) -> [..., S].

    One-hot masked reduction instead of take_along_axis: single-element
    last-axis gathers lower to scattered row reads (~11 ns/row on TPU —
    tools/bench_pdf.py measured 17.4 ms for sample_pdf's four lookups at
    4096x64), while the masked reduce stays on the VPU (<1 ms). Bitwise
    identical result (sum of one selected element and zeros).
    """
    k = table.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k,), 0)
    mask = idx[..., None] == iota
    return jnp.sum(jnp.where(mask, table[..., None, :], 0), axis=-1)


def sample_pdf(key: jax.Array, bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int):
    """Inverse-CDF resampling of `n_samples` new z values from a piecewise PDF.

    bins: [B, R, Nb] bin centers (sorted); weights: [B, R, Nb-1... actually Nb]
    matching reference usage where `bins` are z midpoints and `weights` the
    interior compositing weights. Returns samples [B, R, n_samples].
    """
    stable = weights + 1e-5
    w_sum = jnp.sum(stable, axis=-1, keepdims=True)
    w_sum = jnp.where(jnp.abs(w_sum) == 0, jnp.ones_like(w_sum), w_sum)
    pdf = stable / w_sum
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, R, Nb+1]

    u = jax.random.uniform(key, bins.shape[:2] + (n_samples,), dtype=bins.dtype)

    # above[i] = #(cdf entries <= u_i): one broadcasted compare + integer sum.
    above = jnp.sum(
        (u[..., :, None] >= cdf[..., None, :]).astype(jnp.int32), axis=-1
    )  # [B, R, n_samples]

    nb = bins.shape[-1]
    below = jnp.clip(above - 1, 0, nb - 1)
    above_cdf = jnp.clip(above, 0, cdf.shape[-1] - 1)
    above_bins = jnp.clip(above, 0, nb - 1)

    cdf_a = _select_last(cdf, above_cdf)
    cdf_b = _select_last(cdf, below)
    bins_a = _select_last(bins, above_bins)
    bins_b = _select_last(bins, below)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
