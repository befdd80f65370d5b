"""Bilinear feature gather at continuous pixel locations.

This is the hot scattered-read op of the whole framework: every ray sample and
every grasp probe gathers a feature vector from a [H, W, C] feature image at a
dynamically computed (x, y) location (reference: tfa.image.interpolate_bilinear
at src/lib/mvnerf/nerf_utils.py:282, src/lib/grasp_mvnerf/model.py:137).

Semantics match tfa.interpolate_bilinear(..., indexing='xy'): query points are
(x, y) = (column, row) and are clamped so the 2x2 interpolation stencil stays
in bounds (floor clamped to [0, size-2], like tfa's alpha computed from the
clamped floor).

Two implementations:
  * `bilinear_gather` — pure jnp take-based gather; differentiable, works on
    any backend, and is the autodiff path.
  * `tcnerf.ops.pallas.bilinear` — Pallas TPU kernel for the forward hot loop
    (double-buffered row DMA), used inside the fused render kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_gather(images: jnp.ndarray, coords_xy: jnp.ndarray) -> jnp.ndarray:
    """Gather bilinearly interpolated features.

    images: [B, H, W, C]; coords_xy: [B, N, 2] with (x, y) pixel coordinates.
    Returns [B, N, C].
    """
    h, w = images.shape[1], images.shape[2]
    x = coords_xy[..., 0]
    y = coords_xy[..., 1]

    # tfa clamps the *floor* into [0, size-2] and the query into the grid,
    # computing alphas from the clamped values.
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0.0, w - 2.0)
    y0 = jnp.clip(jnp.floor(y), 0.0, h - 2.0)
    ax = (x - x0)[..., None]
    ay = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = images.reshape(images.shape[0], h * w, images.shape[-1])
    idx00 = y0i * w + x0i
    g = lambda idx: jnp.take_along_axis(flat, idx[..., None], axis=1)
    v00 = g(idx00)
    v01 = g(idx00 + 1)
    v10 = g(idx00 + w)
    v11 = g(idx00 + w + 1)

    top = v00 + ax * (v01 - v00)
    bottom = v10 + ax * (v11 - v10)
    return top + ay * (bottom - top)


def make_corner_image(images: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W, 4C]: each pixel stacked with its +x, +y and
    +x+y neighbors (edge-clamped; the clamped bilinear stencil never reads the
    last row/col through the shifted slots, so clamping is value-irrelevant).

    Why: XLA's TPU row gather is row-COUNT-limited (~11 ns/row, nearly
    independent of row width up to ~2 KB — tools/bench_diag.py DIAG_ALIGN /
    DIAG_CORNERS), so fetching the four bilinear corners as ONE wide row is
    ~1.8x faster than four separate row gathers at the same byte volume.
    """
    x1 = jnp.concatenate([images[:, :, 1:], images[:, :, -1:]], axis=2)
    y1 = jnp.concatenate([images[:, 1:], images[:, -1:]], axis=1)
    xy1 = jnp.concatenate([x1[:, 1:], x1[:, -1:]], axis=1)
    return jnp.concatenate([images, x1, y1, xy1], axis=-1)


def bilinear_gather_corners(corner_images: jnp.ndarray,
                            coords_xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear gather reading ONE row per query from a corner-stacked image.

    corner_images: [B, H, W, 4C] from `make_corner_image`; coords_xy: [B, N, 2]
    (x, y). Returns [B, N, C] with the exact same stencil/alpha semantics as
    `bilinear_gather` (same clamping, same lerp expression).
    """
    b, h, w, c4 = corner_images.shape
    c = c4 // 4
    x = jnp.clip(coords_xy[..., 0], 0.0, w - 1.0)
    y = jnp.clip(coords_xy[..., 1], 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0.0, w - 2.0)
    y0 = jnp.clip(jnp.floor(y), 0.0, h - 2.0)
    ax = (x - x0)[..., None]
    ay = (y - y0)[..., None]
    idx = y0.astype(jnp.int32) * w + x0.astype(jnp.int32)

    flat = corner_images.reshape(b, h * w, c4)
    rows = jnp.take_along_axis(flat, idx[..., None], axis=1)
    v00 = rows[..., :c]
    v01 = rows[..., c:2 * c]
    v10 = rows[..., 2 * c:3 * c]
    v11 = rows[..., 3 * c:]

    top = v00 + ax * (v01 - v00)
    bottom = v10 + ax * (v11 - v10)
    return top + ay * (bottom - top)


def gather_projection_features(normalized_images: jnp.ndarray, features: jnp.ndarray,
                               pixel_xy: jnp.ndarray) -> jnp.ndarray:
    """Concat RGB (normalized to [-1, 1]) with a feature map and sample both at
    projected pixel locations.

    normalized_images: [B, V, H, W, 3]; features: [B, V, H, W, C];
    pixel_xy: [B, V, R, S, 2]. Returns [B, V, R, S, C+3].
    Reference: get_projection_features_mv, nerf_utils.py:277-285.
    """
    b, v, h, w, _ = normalized_images.shape
    r, s = pixel_xy.shape[2], pixel_xy.shape[3]
    coords = pixel_xy.reshape(b * v, r * s, 2)
    # Gather RGB and features SEPARATELY and concat the narrow per-query
    # results: concatenating the images first materializes a [B,V,H,W,259]
    # temp whose 259-channel minor dim pads to 384 on TPU (1.5x) — at batch 8
    # full scale that one temp is 3.5 GB and shows up three times (fwd + two
    # remat'd bwd copies), the allocation that kept the reference-shape
    # batch-8 train step out of HBM. Same stencil, same alphas, exact same
    # values (bilinear_gather is elementwise-deterministic).
    rgb = bilinear_gather(normalized_images.reshape(b * v, h, w, 3), coords)
    feat = bilinear_gather(
        features.reshape(b * v, h, w, features.shape[-1]), coords)
    out = jnp.concatenate([rgb, feat], axis=-1)
    return out.reshape(b, v, r, s, out.shape[-1])
