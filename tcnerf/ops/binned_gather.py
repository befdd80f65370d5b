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
