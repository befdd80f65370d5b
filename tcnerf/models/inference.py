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


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "chunk", "n_samples",
                                    "near", "far", "n_blocks"))
def _render_all_rays_swg(params, src_images, src_intrinsics,
                         src_extrinsics_inv, combined_features, tgt_pose,
                         tgt_intrinsics3, rng, height: int, width: int,
                         chunk: int, n_samples: int, near: float, far: float,
                         n_blocks: int):
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
        # streams. Fine ka=6 (not the bench's 4): full-image renders can
        # pair WIDE-baseline views — measured on the 100°-arc rig (views
        # ~47° apart), fine ka=4 strands ~35k queries/chunk in overflowing
        # subgroups (past any sane cap, every chunk falls back ~3x slower)
        # while ka=6 leaves ~256; the narrow-window win only exists on
        # near-adjacent serving geometry.
        rgb, depth, fine_rgb, fine_depth, n_of = swg_render_chunk(
            prepared, ro, rd, src_intrinsics, src_extrinsics_inv, key,
            n_samples=n_samples, near=near, far=far, n_blocks=n_blocks,
            ka=6, bq=1024, sg=8, ka_c=6, sg_c=8, msplit=4, patch_cap=32768)
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
        fine_rgb, fine_depth, n_overflow = _render_all_rays_swg(
            variables["params"], jnp.asarray(src_images),
            jnp.asarray(src_intr), jnp.asarray(src_ext), combined, tgt_pose,
            tgt_intr3, rng, h, w, swg_chunk, model.n_samples, model.near,
            model.far, model.n_blocks)
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
