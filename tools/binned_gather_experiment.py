"""Binned bilinear gather: scattered reads -> batched one-hot matmuls (MXU).

XLA's scattered row-gather is the dominant cost of pixel-conditioned NeRF on
TPU (see docs/perf_notes.md): every ray sample reads a 4-corner stencil of a
[H, W, C] feature image at a dynamic location. This module restructures it:

  1. the feature image is cut ONCE into [T, P, C] tiles with a +1-pixel halo
     (static-index gather, amortized over every render call of a scene);
  2. samples are sorted by the tile containing their stencil;
  3. per tile, the 4-corner bilinear interpolation of up to K samples becomes
     ONE dense matmul  [K, P] @ [P, C]  whose rows hold the 4 bilinear weights
     (built from broadcasted-iota equality, no scatter);
  4. results come back in sorted order — downstream per-sample MLPs run on the
     sorted layout and only the 4-wide readout is unsorted (cheap), or
     `binned_bilinear_gather` unsorts immediately for drop-in use.

Capacity: K = capacity_factor * N / T (padded). Samples overflowing a tile's
capacity fall back to the plain gather when `strict=True` (exact, used by
tests/training); the serving path uses a generous capacity and `strict=False`
(overflow contributes zeros).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _cdiv(a, b):
    return -(-a // b)


def build_halo_patches(image: jnp.ndarray, tile: Tuple[int, int] = (8, 8)):
    """[H, W, C] -> [T, (th+1)*(tw+1), C] tiles with +1 halo (static gather).

    H, W must be divisible by the tile size. The halo row/col of the last
    tiles clamps to the image border (matching the gather's corner clamping).
    """
    h, w, c = image.shape
    th, tw = tile
    assert h % th == 0 and w % tw == 0, (h, w, tile)
    ty = jnp.arange(h // th) * th
    tx = jnp.arange(w // tw) * tw
    ly = jnp.arange(th + 1)
    lx = jnp.arange(tw + 1)
    rows = jnp.clip(ty[:, None] + ly[None, :], 0, h - 1)   # [Ty, th+1]
    cols = jnp.clip(tx[:, None] + lx[None, :], 0, w - 1)   # [Tx, tw+1]
    # [Ty, Tx, th+1, tw+1] flat pixel ids
    pix = rows[:, None, :, None] * w + cols[None, :, None, :]
    flat = image.reshape(h * w, c)
    patches = flat[pix.reshape(-1)]
    t = (h // th) * (w // tw)
    return patches.reshape(t, (th + 1) * (tw + 1), c)


class BinInfo(NamedTuple):
    slots: jnp.ndarray        # [T, K] sample index into N (sentinel = N)
    valid: jnp.ndarray        # [T, K] bool
    order: jnp.ndarray        # [N] sort order by tile
    covered: jnp.ndarray      # [N] bool — sample landed in a slot
    x0: jnp.ndarray           # [N] int32 corner col
    y0: jnp.ndarray           # [N] int32 corner row
    fx: jnp.ndarray           # [N] frac
    fy: jnp.ndarray           # [N] frac
    tile_id: jnp.ndarray      # [N]


def bin_samples(coords_xy: jnp.ndarray, h: int, w: int,
                tile: Tuple[int, int], capacity: int) -> BinInfo:
    """Assign each sample's stencil to a tile and build fixed-capacity slots."""
    th, tw = tile
    n = coords_xy.shape[0]
    n_tiles = (h // th) * (w // tw)

    x = jnp.clip(coords_xy[:, 0], 0.0, w - 1.0)
    y = jnp.clip(coords_xy[:, 1], 0.0, h - 1.0)
    x0f = jnp.clip(jnp.floor(x), 0.0, w - 2.0)
    y0f = jnp.clip(jnp.floor(y), 0.0, h - 2.0)
    fx = x - x0f
    fy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    tile_id = (y0 // th) * (w // tw) + (x0 // tw)

    order = jnp.argsort(tile_id)
    sorted_tid = tile_id[order]
    first = jnp.searchsorted(sorted_tid, jnp.arange(n_tiles), side="left")
    rank = jnp.arange(n) - first[sorted_tid]

    in_cap = rank < capacity
    slot_col = jnp.where(in_cap, rank, capacity)  # overflow -> spill column
    slots = jnp.full((n_tiles, capacity + 1), n, dtype=jnp.int32)
    slots = slots.at[sorted_tid, slot_col].set(jnp.where(in_cap, order, n))
    slots = slots[:, :capacity]
    valid = slots < n

    covered = jnp.zeros(n, bool).at[order].set(in_cap)
    return BinInfo(slots, valid, order, covered, x0, y0, fx, fy, tile_id)


def gather_sorted(patches: jnp.ndarray, info: BinInfo, tile: Tuple[int, int],
                  w: int, group: int = 512) -> jnp.ndarray:
    """[T, P, C] patches + bins -> bilinear features [T, K, C] (slot layout)."""
    th, tw = tile
    t, p, c = patches.shape
    k = info.slots.shape[1]

    # per-slot corner data (index N = sentinel -> harmless zeros via valid)
    pad = lambda a: jnp.concatenate([a, jnp.zeros((1,), a.dtype)])
    sx0 = pad(info.x0)[info.slots]
    sy0 = pad(info.y0)[info.slots]
    sfx = pad(info.fx.astype(patches.dtype))[info.slots]
    sfy = pad(info.fy.astype(patches.dtype))[info.slots]
    lx = sx0 - (sx0 // tw) * tw
    ly = sy0 - (sy0 // th) * th
    p00 = ly * (tw + 1) + lx

    n_groups = _cdiv(t, group)
    t_pad = n_groups * group
    if t_pad != t:
        padt = lambda a: jnp.concatenate(
            [a, jnp.zeros((t_pad - t,) + a.shape[1:], a.dtype)])
        patches_g, p00_g, sfx_g, sfy_g, valid_g = map(
            padt, (patches, p00, sfx, sfy, info.valid))
    else:
        patches_g, p00_g, sfx_g, sfy_g, valid_g = (patches, p00, sfx, sfy,
                                                   info.valid)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, p), 2)

    def step(_, args):
        pt, p00_, fx_, fy_, val = args
        w00 = (1 - fx_) * (1 - fy_)
        w01 = fx_ * (1 - fy_)
        w10 = (1 - fx_) * fy_
        w11 = fx_ * fy_
        eq = lambda idx: (iota == idx[..., None]).astype(pt.dtype)
        oh = (w00[..., None] * eq(p00_)
              + w01[..., None] * eq(p00_ + 1)
              + w10[..., None] * eq(p00_ + tw + 1)
              + w11[..., None] * eq(p00_ + tw + 2))
        oh = oh * val[..., None].astype(pt.dtype)
        # f32 inputs keep exact bilinear parity; bf16 rides the fast MXU path
        precision = (jax.lax.Precision.HIGHEST
                     if pt.dtype == jnp.float32 else None)
        return None, jnp.einsum("tkp,tpc->tkc", oh, pt, precision=precision)

    reshape_g = lambda a: a.reshape((n_groups, group) + a.shape[1:])
    _, out = jax.lax.scan(step, None,
                          (reshape_g(patches_g), reshape_g(p00_g),
                           reshape_g(sfx_g), reshape_g(sfy_g),
                           reshape_g(valid_g)))
    return out.reshape(t_pad, k, c)[:t]


def unsort(feats_slots: jnp.ndarray, info: BinInfo, n: int) -> jnp.ndarray:
    """[T, K, C] slot layout -> [N, C] original order (zeros where uncovered)."""
    t, k, c = feats_slots.shape
    out = jnp.zeros((n + 1, c), feats_slots.dtype)
    out = out.at[info.slots.reshape(-1)].set(feats_slots.reshape(-1, c))
    return out[:n]


@functools.partial(jax.jit, static_argnames=("tile", "capacity_factor",
                                             "strict", "group"))
def binned_bilinear_gather(image: jnp.ndarray, coords_xy: jnp.ndarray,
                           tile: Tuple[int, int] = (8, 8),
                           capacity_factor: float = 4.0,
                           strict: bool = True, group: int = 512):
    """Drop-in [H, W, C] x [N, 2] -> [N, C] bilinear gather via binned matmuls.

    strict=True falls back to the plain gather for capacity-overflow samples
    (exact for any input distribution).
    """
    h, w, c = image.shape
    n = coords_xy.shape[0]
    n_tiles = (h // tile[0]) * (w // tile[1])
    capacity = max(8, int(_cdiv(int(n * capacity_factor), n_tiles)))
    capacity = _cdiv(capacity, 8) * 8

    info = bin_samples(coords_xy, h, w, tile, capacity)
    patches = build_halo_patches(image, tile)
    feats = gather_sorted(patches, info, tile, w, group)
    out = unsort(feats, info, n)
    if strict:
        from .interpolate import bilinear_gather
        fallback = bilinear_gather(image[None], coords_xy[None])[0]
        out = jnp.where(info.covered[:, None], out, fallback.astype(out.dtype))
    return out


# ---------------------------------------------------------------------------
# The binned render paths that used this gather (formerly models/fused.py) —
# kept with the experiment: measured slower than the sorted-window fused
# kernel (docs/perf_notes.md round 1/2).

import jax
import jax.numpy as jnp

from tcnerf.core import projection, render, sampling
from tcnerf.core.encoding import positional_encoding
from tcnerf.models.fused import flatten_mv_params
from tcnerf.ops.pallas.resmlp import resmlp_rows

def binned_field(flat_weights, world_points, z, cam_dirs, normalized_images,
                 src_intrinsics, src_extrinsics_inv, patches, image_hw,
                 n_blocks: int, tile=(8, 8), capacity_factor: float = 4.0,
                 n_freq: int = 10, group: int = 512):
    """Field evaluation with the binned one-hot-matmul gather (n_views=1).

    `patches` are precomputed halo tiles of concat(normalized_rgb, features)
    (ops.binned_gather.build_halo_patches) — built once per scene. The MLP runs
    on the SORTED slot layout [T*K, D]; only the 4-wide readout is unsorted.
    Capacity overflow contributes zero features (serving path; see
    docs/perf_notes.md).
    """
    import tools.binned_gather_experiment as bg

    b, r, s, _ = world_points.shape
    h, w = image_hw
    th, tw = tile
    pixel_xy, cam_points = projection.project_points_mv(
        world_points, src_intrinsics, src_extrinsics_inv)
    coords = pixel_xy.reshape(-1, 2)
    n = coords.shape[0]
    n_tiles = (h // th) * (w // tw)
    capacity = max(8, -(-int(n * capacity_factor) // n_tiles))
    capacity = -(-capacity // 8) * 8

    info = bg.bin_samples(coords, h, w, tile, capacity)
    feats_slots = bg.gather_sorted(patches, info, tile, w, group)  # [T, K, C]
    t, k, c = feats_slots.shape

    # permute the small per-sample inputs into slot layout
    pos = cam_points[..., :3].reshape(-1, 3)
    dirs = jnp.broadcast_to(cam_dirs[:, :, :, None, :],
                            (b, 1, r, s, 3)).reshape(-1, 3)
    pad = lambda a: jnp.concatenate([a, jnp.zeros((1, a.shape[1]), a.dtype)])
    pos_s = pad(pos)[info.slots.reshape(-1)]
    dirs_s = pad(dirs)[info.slots.reshape(-1)]

    x = jnp.concatenate([
        positional_encoding(pos_s, n_freq),
        positional_encoding(dirs_s, n_freq),
        feats_slots.reshape(t * k, c),
    ], axis=-1).astype(patches.dtype)
    out = resmlp_rows(x, flat_weights, n_blocks, readout=True,
                      tile=1024)                      # [T*K, 4]
    out = bg.unsort(out.reshape(t, k, 4), info, n).astype(jnp.float32)
    out = out.reshape(b, r, s, 4)
    chroma = jax.nn.sigmoid(out[..., :3])
    density = jax.nn.softplus(out[..., 3])
    # uncovered samples (capacity overflow) -> zero density (transparent)
    covered = info.covered.reshape(b, r, s)
    density = jnp.where(covered, density, 0.0)
    return chroma, density


def binned_render_rays(params, ray_o, ray_d, src_images, src_intrinsics,
                       src_extrinsics_inv, combined_features, key,
                       n_samples: int = 64, near: float = 0.3, far: float = 1.3,
                       n_blocks: int = 6, tile=(8, 8),
                       capacity_factor: float = 4.0):
    """Hierarchical render with the binned gather path (1-view serving)."""
    import tools.binned_gather_experiment as bg

    key_c, key_f = jax.random.split(key)
    dtype = combined_features.dtype
    coarse = tuple(w_.astype(dtype) for w_ in flatten_mv_params(
        params["coarse_embedding"], n_blocks, params["coarse_readout"]))
    fine = tuple(w_.astype(dtype) for w_ in flatten_mv_params(
        params["fine_embedding"], n_blocks, params["fine_readout"]))

    normalized = (src_images * 2.0 - 1.0).astype(dtype)
    combined = jnp.concatenate([normalized, combined_features], axis=-1)
    h, w = combined.shape[2], combined.shape[3]
    patches = bg.build_halo_patches(combined[0, 0], tile)  # once per scene

    world_points, z = sampling.sample_along_ray(key_c, ray_o, ray_d, near, far,
                                                n_samples)
    cam_dirs = projection.world_to_camera_directions_mv(ray_d,
                                                        src_extrinsics_inv)
    chroma, density = binned_field(coarse, world_points, z, cam_dirs,
                                   normalized, src_intrinsics,
                                   src_extrinsics_inv, patches, (h, w),
                                   n_blocks, tile, capacity_factor)
    rgb, depth, weights = render.volumetric_render(z, density, chroma)

    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    z_fine = sampling.sample_pdf(key_f, z_mid, weights[..., 1:-1], n_samples)
    from tcnerf.ops.sortmerge import merge_sorted, sort_small
    all_z = merge_sorted(z, sort_small(z_fine))
    fine_points = ray_o[:, :, None, :] + all_z[..., None] * ray_d[:, :, None, :]
    fine_chroma, fine_density = binned_field(fine, fine_points, all_z, cam_dirs,
                                             normalized, src_intrinsics,
                                             src_extrinsics_inv, patches,
                                             (h, w), n_blocks, tile,
                                             capacity_factor)
    fine_rgb, fine_depth, _ = render.volumetric_render(all_z, fine_density,
                                                       fine_chroma)
    return rgb, depth, fine_rgb, fine_depth
