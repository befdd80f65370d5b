"""Full-image rendering (validation/inference).

Reference: module-level render_view (src/lib/mvnerf/model_v0.py:243-281) —
encode sources once, then 600 sequential host-loop chunks of 512 rays. Here
the chunk loop is a device-side lax.map inside ONE jitted program: rays are
generated on device, padded to a chunk multiple, and scanned; only the final
image crosses back to the host.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rays import get_rays_jax


@functools.partial(jax.jit,
                   static_argnames=("apply_fn", "height", "width", "chunk"))
def _render_all_rays(apply_fn, variables, src_images, src_intrinsics,
                     src_extrinsics_inv, combined_features, tgt_pose,
                     tgt_intrinsics3, rng, height: int, width: int, chunk: int):
    rays_o, rays_d = get_rays_jax(width, height, tgt_pose, tgt_intrinsics3)
    n = height * width
    n_pad = (-n) % chunk
    flat_o = jnp.concatenate(
        [rays_o.reshape(-1, 3), jnp.zeros((n_pad, 3), rays_o.dtype)])
    flat_d = jnp.concatenate(
        [rays_d.reshape(-1, 3), jnp.ones((n_pad, 3), rays_d.dtype)])
    n_chunks = (n + n_pad) // chunk
    chunks_o = flat_o.reshape(n_chunks, 1, chunk, 3)
    chunks_d = flat_d.reshape(n_chunks, 1, chunk, 3)
    keys = jax.random.split(rng, n_chunks)

    def render_chunk(args):
        ro, rd, key = args
        rgb, depth, fine_rgb, fine_depth = apply_fn(
            variables, ro, rd, src_images, src_intrinsics, src_extrinsics_inv,
            combined_features, rngs={"sampling": key}, method="render_rays")
        return fine_rgb[0], fine_depth[0]

    fine_rgb, fine_depth = jax.lax.map(render_chunk, (chunks_o, chunks_d, keys))
    fine_rgb = fine_rgb.reshape(-1, 3)[:n].reshape(height, width, 3)
    fine_depth = fine_depth.reshape(-1)[:n].reshape(height, width)
    return fine_rgb, fine_depth


def _swg_window_spans(keys: np.ndarray, chunk_q: int, sub: int, ka: int):
    """Overflowed-query count per chunk for ka*128-row subgroup windows.

    keys: raster-ordered corner keys (y0 * w_pad + x0) of every query of one
    stage; exact replica of swg_rows' span check (sort per chunk, window
    base = first key's 128-row group per `sub` queries)."""
    out = []
    n = keys.shape[0]
    for c0 in range(0, n, chunk_q):
        ks = np.sort(keys[c0:c0 + chunk_q])
        pad = (-ks.shape[0]) % sub
        if pad:
            ks = np.concatenate([ks, np.full((pad,), ks[-1], ks.dtype)])
        grp = ks.reshape(-1, sub)
        span = grp[:, -1] - (grp[:, 0] // 128) * 128
        out.append(int((span > ka * 128 - 2).sum()) * sub)
    return out


_WINDOW_CACHE: dict = {}


def choose_swg_windows(src_intr3: np.ndarray, src_ext_inv: np.ndarray,
                       tgt_pose: np.ndarray, tgt_intr3: np.ndarray,
                       height: int, width: int, near: float, far: float,
                       n_samples: int, chunk: int, sub: int = 128,
                       patch_cap: int = 32768,
                       candidates=(4, 6, 8, 12, 16)):
    """Pick (ka_fine, ka_coarse) for a full-image render by simulating the
    sorted-window span profile of THIS camera pair on the host (numpy).

    Window width is a property of the source/target baseline: near-adjacent
    views project raster chunks onto tight bands (ka=4 optimal), while a
    wide-baseline pair (e.g. ~47° apart on the capture arc) strands tens of
    thousands of queries per chunk outside 512-row windows — past any patch
    capacity, so every chunk silently takes the ~3x slower exact fallback.
    This replays swg_rows' exact span check over a handful of representative
    chunks (uniform-z proxy for the pdf-resampled fine stage) and returns
    the narrowest candidate whose worst chunk overflows <= patch_cap/2 —
    headroom for the fine stage's pdf clustering, which concentrates z where
    the coarse weights peak and roughly doubles the uniform-proxy overflow.
    Cached per (pair, shape) — ~0.3 s once, then free."""
    key = (src_intr3.tobytes(), src_ext_inv.tobytes(), tgt_pose.tobytes(),
           tgt_intr3.tobytes(), height, width, near, far, n_samples, chunk,
           sub, patch_cap)
    if key in _WINDOW_CACHE:
        return _WINDOW_CACHE[key]
    w_pad = ((width + 127) // 128) * 128
    # every 7th chunk (first/last included): spans vary smoothly with the
    # raster row, a stride covers the range at ~1/7 the host cost
    n = height * width
    chunk_ids = sorted(set(range(0, (n + chunk - 1) // chunk, 7))
                       | {(n - 1) // chunk})
    jj, ii = np.meshgrid(np.arange(width, dtype=np.float32),
                         np.arange(height, dtype=np.float32))
    dirs_cam = np.stack([(jj - tgt_intr3[0, 2]) / tgt_intr3[0, 0],
                         (ii - tgt_intr3[1, 2]) / tgt_intr3[1, 1],
                         np.ones_like(jj)], -1).reshape(-1, 3)
    rd = dirs_cam @ np.asarray(tgt_pose[:3, :3], np.float32).T
    ro = np.asarray(tgt_pose[:3, 3], np.float32)
    rows = np.concatenate([np.arange(c * chunk, min((c + 1) * chunk, n))
                           for c in chunk_ids])
    rd = rd[rows]

    def stage_keys(n_s):
        z = (near + (far - near)
             * (np.arange(n_s, dtype=np.float32) + 0.5) / n_s)
        pts = ro[None, None, :] + z[None, :, None] * rd[:, None, :]
        pc = pts.reshape(-1, 3) @ np.asarray(
            src_ext_inv[:3, :3], np.float32).T + np.asarray(
            src_ext_inv[:3, 3], np.float32)
        zc = np.maximum(pc[:, 2], 1e-8)
        px = src_intr3[0, 0] * pc[:, 0] / zc + src_intr3[0, 2]
        py = src_intr3[1, 1] * pc[:, 1] / zc + src_intr3[1, 2]
        x0 = np.clip(np.floor(np.clip(px, 0, width - 1)), 0, width - 2)
        y0 = np.clip(np.floor(np.clip(py, 0, height - 1)), 0, height - 2)
        return (y0 * w_pad + x0).astype(np.int64)

    def pick(n_s):
        keys = stage_keys(n_s)
        chunk_q = chunk * n_s
        for ka in candidates:
            worst = max(_swg_window_spans(keys, chunk_q, sub, ka))
            if worst <= patch_cap // 2:
                return ka
        return candidates[-1]

    result = (pick(2 * n_samples), pick(n_samples))  # (fine, coarse)
    _WINDOW_CACHE[key] = result
    return result


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "chunk", "n_samples",
                                    "near", "far", "n_blocks", "ka", "ka_c"))
def _render_all_rays_swg(params, src_images, src_intrinsics,
                         src_extrinsics_inv, combined_features, tgt_pose,
                         tgt_intrinsics3, rng, height: int, width: int,
                         chunk: int, n_samples: int, near: float, far: float,
                         n_blocks: int, ka: int = 6, ka_c: int = 6):
    """Full-image render through the sorted-window fused kernel (1-view).

    Raster-ordered ray chunks are spatially coherent, so the sorted-window
    gather's row windows are tight and the per-chunk sorts nearly ordered —
    the serving-optimal full-image path (perf equivalent of the reference's
    render_view hot loop, model_v0.py:243-281)."""
    from .fused import swg_prepare, swg_render_chunk

    rays_o, rays_d = get_rays_jax(width, height, tgt_pose, tgt_intrinsics3)
    n = height * width
    n_pad = (-n) % chunk
    flat_o = jnp.concatenate(
        [rays_o.reshape(-1, 3), jnp.zeros((n_pad, 3), rays_o.dtype)])
    flat_d = jnp.concatenate(
        [rays_d.reshape(-1, 3), jnp.ones((n_pad, 3), rays_d.dtype)])
    n_chunks = (n + n_pad) // chunk
    chunks_o = flat_o.reshape(n_chunks, 1, chunk, 3)
    chunks_d = flat_d.reshape(n_chunks, 1, chunk, 3)
    keys = jax.random.split(rng, n_chunks)
    # serving runs bf16 regardless of the model dtype (output is uint8; the
    # parity tests bound the bf16 stream at 2e-2) — f32 window blocks blow
    # the 16M scoped-vmem limit at the tuned window geometry
    prepared = swg_prepare(params, src_images, combined_features,
                           n_blocks=n_blocks, ka=4, dtype=jnp.bfloat16)

    def render_chunk(args):
        ro, rd, key = args
        # tuned round-3 knobs (docs/perf_notes.md): narrow windows with a
        # large block-level patch-repair capacity (the swept optimum —
        # repair prices sparse subgroups at ~1.6% of chain work, window
        # width prices them into every subgroup's DMA), 4 interleaved chain
        # streams. ka/ka_c are baseline-dependent and chosen per camera
        # pair by choose_swg_windows (a wide-baseline pair at the bench's
        # ka=4 strands ~35k queries/chunk past the cap — measured on the
        # 100°-arc rig — silently putting EVERY chunk on the ~3x fallback).
        rgb, depth, fine_rgb, fine_depth, n_of = swg_render_chunk(
            prepared, ro, rd, src_intrinsics, src_extrinsics_inv, key,
            n_samples=n_samples, near=near, far=far, n_blocks=n_blocks,
            ka=ka, bq=1024, sg=8, ka_c=ka_c, sg_c=8, msplit=4,
            patch_cap=32768)
        return fine_rgb[0], fine_depth[0], n_of

    fine_rgb, fine_depth, n_of = jax.lax.map(render_chunk,
                                             (chunks_o, chunks_d, keys))
    fine_rgb = fine_rgb.reshape(-1, 3)[:n].reshape(height, width, 3)
    fine_depth = fine_depth.reshape(-1)[:n].reshape(height, width)
    return fine_rgb, fine_depth, jnp.sum(n_of)


def render_view(model, variables, src_colors, src_camera_configs,
                tgt_camera_config, rng=None, chunk: Optional[int] = None,
                clip_outputs=None, clip_textuals=None,
                use_swg: Optional[bool] = None):
    """Render the target camera's full view from source images.

    src_colors: list of [H, W, >=3] uint8; camera configs are
    {'pose': 4x4, 'intrinsics': 9-flat} dicts. Returns (rgb uint8 [H, W, 3],
    min-max-normalized depth uint8 [H, W, 1]) like the reference.

    use_swg: route chunks through the sorted-window fused kernel
    (ops/pallas/swg.py). Default: auto — on for the 1-view serving shape
    (hidden 128) on TPU backends, off elsewhere (the flax path works on any
    backend and any view count).
    """
    from ..data.generators import camera_parameters

    rng = jax.random.PRNGKey(0) if rng is None else rng
    h, w = src_colors[0].shape[:2]
    src_images = np.array([c[..., :3] / 255.0 for c in src_colors],
                          dtype=np.float32)[None]  # [1, V, H, W, 3]
    ext_invs, intrs = [], []
    for cfg in src_camera_configs:
        ext_inv, k4 = camera_parameters(cfg)
        ext_invs.append(ext_inv)
        intrs.append(k4)
    src_intr = np.asarray(intrs, np.float32)[None]
    src_ext = np.asarray(ext_invs, np.float32)[None]

    v = src_images.shape[1]
    flat = jnp.asarray(src_images[0])
    combined, _ = model.apply(variables, flat, clip_outputs, clip_textuals,
                              method="combine_features")
    combined = combined[None]

    tgt_pose = jnp.asarray(tgt_camera_config["pose"], jnp.float32)
    tgt_intr3 = jnp.asarray(
        np.reshape(tgt_camera_config["intrinsics"], (3, 3)), jnp.float32)

    if use_swg is None:
        # The swg kernel hard-codes the flagship serving shape: 1 view,
        # hidden 128, dir-encoded 120-wide pos/dir head (pd=120/n_freq=10),
        # relu chain. Any renderer knob outside that set must take the
        # general flax path or it would silently render wrong output.
        use_swg = (v == 1 and model.hidden_size == 128
                   and model.embed_direction_vector
                   and jax.default_backend() != "cpu")
    if use_swg:
        # decide the swg default while `chunk` is still the caller's: None
        # means "pick the path's optimum" (8192 amortizes the sorts and the
        # per-dispatch floor — docs/perf_notes.md round 3); an explicit 512
        # must stay 512
        swg_chunk = 8192 if chunk is None else chunk
        ka, ka_c = choose_swg_windows(
            np.asarray(src_intr[0, 0, :3, :3]), np.asarray(src_ext[0, 0]),
            np.asarray(tgt_camera_config["pose"], np.float32),
            np.asarray(np.reshape(tgt_camera_config["intrinsics"], (3, 3)),
                       np.float32),
            h, w, float(model.near), float(model.far), model.n_samples,
            swg_chunk)
        fine_rgb, fine_depth, n_overflow = _render_all_rays_swg(
            variables["params"], jnp.asarray(src_images),
            jnp.asarray(src_intr), jnp.asarray(src_ext), combined, tgt_pose,
            tgt_intr3, rng, h, w, swg_chunk, model.n_samples, model.near,
            model.far, model.n_blocks, ka=ka, ka_c=ka_c)
        n_overflow = int(n_overflow)
        if n_overflow:
            from ..utils.logging import logger
            logger.warning(
                f"render_view: {n_overflow} swg stage(s) overflowed their "
                "sorted windows and took the ~3x slower exact fallback — "
                "widen ka/sg for this geometry")
    else:
        fine_rgb, fine_depth = _render_all_rays(
            model.apply, variables, jnp.asarray(src_images),
            jnp.asarray(src_intr), jnp.asarray(src_ext), combined, tgt_pose,
            tgt_intr3, rng, h, w, 512 if chunk is None else chunk)

    rgb = np.clip(np.asarray(fine_rgb) * 255, 0, 255).astype(np.uint8)
    depth = np.asarray(fine_depth)[..., None]
    denom = max(depth.max() - depth.min(), 1e-12)
    depth_u8 = ((depth - depth.min()) / denom * 255).astype(np.uint8)
    return rgb, depth_u8


def psnr(pred_u8: np.ndarray, target_u8: np.ndarray) -> float:
    """PSNR between uint8 images (dB)."""
    a = pred_u8.astype(np.float64) / 255.0
    b = target_u8.astype(np.float64) / 255.0
    mse = float(np.mean((a - b) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))
