"""Fused serving-path renderer: Pallas residual-MLP chain inside the
hierarchical render.

For the flagship 1-view configuration the mid-network view fusion is the
identity, so the whole NeRF embedding + readout is one dense chain — evaluated
here by tcnerf.ops.pallas.resmlp with all weights resident in VMEM (one HBM
read per sample row instead of one per layer). Geometry, sampling and
compositing reuse tcnerf.core, so outputs are parity-testable against
MVNeRFRenderer._field (tests/test_kernels.py::TestFusedField).

This is the inference/bench hot path; training keeps the flax/XLA path (the
kernel is forward-only).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import projection, render, sampling
from ..core.encoding import positional_encoding
from ..ops.interpolate import gather_projection_features
from ..ops.pallas.resmlp import resmlp_rows


def flatten_mv_params(mlp_params, n_blocks: int, readout_params=None):
    """MVResNetMLPEmbedding (n_views=1) + RenderReadout params -> flat tuple."""
    n_feature = n_blocks // 2
    n_fusion = n_blocks - n_feature
    flat = [mlp_params["layer_0"]["kernel"], mlp_params["layer_0"]["bias"]]
    for i in range(n_feature):
        b = mlp_params[f"feature_block_{i}"]
        flat += [b["layer_0"]["kernel"], b["layer_0"]["bias"],
                 b["layer_1"]["kernel"], b["layer_1"]["bias"]]
    for i in range(n_fusion):
        b = mlp_params[f"fusion_block_{i}"]
        flat += [b["layer_0"]["kernel"], b["layer_0"]["bias"],
                 b["layer_1"]["kernel"], b["layer_1"]["bias"]]
    if readout_params is not None:
        flat += [readout_params["output_layer"]["kernel"],
                 readout_params["output_layer"]["bias"]]
    return tuple(flat)


def fused_field(flat_weights, world_points, z, cam_dirs, normalized_images,
                src_intrinsics, src_extrinsics_inv, combined_features,
                n_blocks: int, n_freq: int = 10, tile: int = 1024,
                embed_direction_vector: bool = True,
                pos_encoding_freq: float = float(np.pi),
                interpret: bool = False):
    """Chroma/density via the Pallas chain (1-view). Shapes as renderer._field.

    embed_direction_vector / pos_encoding_freq mirror MVResNetMLPEmbedding's
    knobs — a model configured differently must thread them here or layer_0's
    input width will not match (loud dot-dimension error for the former,
    silent numeric divergence for the latter)."""
    b, r, s, _ = world_points.shape
    pixel_xy, cam_points = projection.project_points_mv(
        world_points, src_intrinsics, src_extrinsics_inv)
    feats = gather_projection_features(normalized_images, combined_features,
                                       pixel_xy)  # [B, 1, R, S, C+3]
    dirs = jnp.broadcast_to(cam_dirs[:, :, :, None, :], (b, 1, r, s, 3))

    x = jnp.concatenate([
        positional_encoding(cam_points[..., :3], n_freq, pos_encoding_freq),
        (positional_encoding(dirs, n_freq, pos_encoding_freq)
         if embed_direction_vector else dirs),
        feats,
    ], axis=-1)
    x = x.reshape(-1, x.shape[-1]).astype(combined_features.dtype)
    out = resmlp_rows(x, flat_weights, n_blocks, readout=True, tile=tile,
                      interpret=interpret)
    out = out.astype(jnp.float32).reshape(b, r, s, 4)
    chroma = jax.nn.sigmoid(out[..., :3])
    density = jax.nn.softplus(out[..., 3])
    return chroma, density


def fused_render_rays(params, ray_o, ray_d, src_images, src_intrinsics,
                      src_extrinsics_inv, combined_features, key,
                      n_samples: int = 64, near: float = 0.3, far: float = 1.3,
                      n_blocks: int = 6, tile: int = 1024,
                      interpret: bool = False):
    """Hierarchical render using the fused field (parity with
    MVNeRFRenderer.render_rays semantics for n_views=1)."""
    key_c, key_f = jax.random.split(key)
    coarse = flatten_mv_params(params["coarse_embedding"], n_blocks,
                               params["coarse_readout"])
    fine = flatten_mv_params(params["fine_embedding"], n_blocks,
                             params["fine_readout"])
    dtype = combined_features.dtype
    coarse = tuple(w.astype(dtype) for w in coarse)
    fine = tuple(w.astype(dtype) for w in fine)

    normalized = (src_images * 2.0 - 1.0).astype(dtype)
    world_points, z = sampling.sample_along_ray(key_c, ray_o, ray_d, near, far,
                                                n_samples)
    cam_dirs = projection.world_to_camera_directions_mv(ray_d,
                                                        src_extrinsics_inv)

    chroma, density = fused_field(coarse, world_points, z, cam_dirs, normalized,
                                  src_intrinsics, src_extrinsics_inv,
                                  combined_features, n_blocks, tile=tile,
                                  interpret=interpret)
    rgb, depth, weights = render.volumetric_render(z, density, chroma)

    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    z_fine = sampling.sample_pdf(key_f, z_mid, weights[..., 1:-1], n_samples)
    from ..ops.sortmerge import merge_sorted, sort_small
    all_z = merge_sorted(z, sort_small(z_fine))
    fine_points = ray_o[:, :, None, :] + all_z[..., None] * ray_d[:, :, None, :]

    fine_chroma, fine_density = fused_field(
        fine, fine_points, all_z, cam_dirs, normalized, src_intrinsics,
        src_extrinsics_inv, combined_features, n_blocks, tile=tile,
        interpret=interpret)
    fine_rgb, fine_depth, _ = render.volumetric_render(all_z, fine_density,
                                                       fine_chroma)
    return rgb, depth, fine_rgb, fine_depth


def swg_field(stage_params, world_points, z, cam_dirs, img_grouped,
              w_pad: int, w_groups: int, image_hw, src_intrinsics,
              src_extrinsics_inv, n_blocks: int, n_freq: int = 10,
              ka: int = 6, bq: int = 512, sg: int = 1,
              msplit: int = 1, patch_cap: int = 8192,
              fast: bool = True, nsplit: int = 1,
              interpret: bool = False, stage_prep=None):
    """Field evaluation via the sorted-window fused gather+MLP kernel
    (ops/pallas/swg.py; 1-view serving). stage_params = (head_k, head_b,
    flat_block_and_readout_weights); stage_prep optionally carries the
    precomputed transposed artifacts (img_grouped_t, head_pad_t, flat_t)
    from swg_prepare so chunk loops do not rebuild them.

    Returns (chroma, density, overflowed) — up to patch_cap queries from
    overflowing sorted subgroups are repaired exactly in-place (block-level
    patch, swg_rows docstring); `overflowed` is True only when MORE than
    patch_cap queries overflowed and the whole call took the exact-but-
    slower XLA fallback; callers should surface it (the fallback is a
    silent ~3x throughput regression otherwise)."""
    from ..ops.pallas.swg import swg_rows

    head_k, head_b, flat = stage_params
    img_t, head_pt, flat_t = stage_prep or (None, None, None)
    b, r, s, _ = world_points.shape
    h, w = image_hw
    pixel_xy, cam_points = projection.project_points_mv(
        world_points, src_intrinsics, src_extrinsics_inv)
    coords = pixel_xy.reshape(-1, 2)
    pos = cam_points[..., :3].reshape(-1, 3)
    dirs = jnp.broadcast_to(cam_dirs[:, :, :, None, :],
                            (b, 1, r, s, 3)).reshape(-1, 3)
    out, overflowed = swg_rows(
        img_grouped, w_pad, w_groups, w, h, coords, pos, dirs,
        head_k, head_b, flat, n_blocks, n_freq=n_freq, ka=ka,
        bq=bq, sg=sg, msplit=msplit, patch_cap=patch_cap,
        fast=fast, nsplit=nsplit,
        img_grouped_t=img_t, head_pad_t=head_pt, flat_t=flat_t,
        interpret=interpret)
    out = out.astype(jnp.float32).reshape(b, r, s, 4)
    chroma = jax.nn.sigmoid(out[..., :3])
    density = jax.nn.softplus(out[..., 3])
    return chroma, density, overflowed


def swg_stage_params(params, stage: str, n_blocks: int, dtype):
    """(head_kernel, head_bias, flat block+readout weights) for a stage.

    The layer_0 kernel splits at the pos/dir-encoding width: rows [:pd] form
    the head applied to encodings, rows [pd:] are pre-projected into the
    feature image (SliceableDense semantics, nn/mlp.py)."""
    emb = params[f"{stage}_embedding"]
    k = emb["layer_0"]["kernel"]
    b0 = emb["layer_0"]["bias"]
    flat = flatten_mv_params(emb, n_blocks, params[f"{stage}_readout"])[2:]
    flat = tuple(w.astype(dtype) for w in flat)
    return k, b0, flat


def swg_prepare(params, src_images, combined_features, n_blocks: int = 6,
                pd: int = None, ka: int = 6, fast: bool = True, dtype=None,
                n_freq: int = 10):
    """Precompute every chunk-invariant artifact for the swg render path.

    Returns an opaque tuple consumed by swg_render_chunk. Doing this ONCE
    outside the chunk scan matters: the pre-projected/transposed images and
    permuted weights live inside a lax.cond branch in the chunk body, where
    XLA's loop-invariant hoisting cannot reach them.

    dtype overrides the stream dtype (default: combined_features'). Serving
    paths should pass bfloat16 even for f32 models: the window blocks DMA'd
    into VMEM halve, which is what keeps wide coarse windows (ka_c=12,
    sg_c=8) inside the 16M scoped-vmem limit — the f32 render_view config
    hit the cliff at 16.06M."""
    from ..ops.pallas.swg import (head_pad_transposed, prepare_image,
                                  transpose_chain_weights)

    # the swg kernels assume embed_direction_vector=True: pd = pos + dir
    # octaves = 2 * (2 * n_freq) * 3. A mismatched explicit pd would build
    # a corrupted permuted head via clamped out-of-bounds gathers.
    if pd is None:
        pd = 12 * n_freq
    assert pd == 12 * n_freq, (
        f"pd={pd} inconsistent with n_freq={n_freq} (expect {12 * n_freq})")
    b, v = src_images.shape[:2]
    assert b == 1 and v == 1, (
        "swg_prepare is the 1-view serving path; multi-view inputs would "
        "silently render from view 0 only")
    dtype = combined_features.dtype if dtype is None else dtype
    combined_features = combined_features.astype(dtype)
    head_ck, head_cb, flat_c = swg_stage_params(params, "coarse", n_blocks,
                                                dtype)
    head_fk, head_fb, flat_f = swg_stage_params(params, "fine", n_blocks,
                                                dtype)

    normalized = (src_images * 2.0 - 1.0).astype(dtype)
    combined = jnp.concatenate([normalized, combined_features], axis=-1)[0, 0]
    h, w = combined.shape[:2]
    img_c = combined @ head_ck[pd:].astype(dtype)   # pre-project: coarse
    img_f = combined @ head_fk[pd:].astype(dtype)   # pre-project: fine
    grouped_c, w_pad, w_groups = prepare_image(img_c, ka=ka)
    grouped_f, _, _ = prepare_image(img_f, ka=ka)

    def prep(head_k, flat):
        if not fast:
            return None
        return (None, head_pad_transposed(head_k[:pd], 3, n_freq).astype(dtype),
                transpose_chain_weights(flat))

    prep_c = prep(head_ck, flat_c)
    prep_f = prep(head_fk, flat_f)
    if fast:
        prep_c = (jnp.transpose(grouped_c, (0, 2, 1)),) + prep_c[1:]
        prep_f = (jnp.transpose(grouped_f, (0, 2, 1)),) + prep_f[1:]
    stage_c = ((head_ck[:pd], head_cb, flat_c), grouped_c, prep_c)
    stage_f = ((head_fk[:pd], head_fb, flat_f), grouped_f, prep_f)
    # limits: the image padding supports windows up to max(ka, 16)
    # groups (prepare_image), and the permuted heads bake in n_freq
    return (stage_c, stage_f, (h, w), w_pad, w_groups,
            (max(ka, 16), n_freq))


def swg_render_chunk(prepared, ray_o, ray_d, src_intrinsics,
                     src_extrinsics_inv, key, n_samples: int = 64,
                     near: float = 0.3, far: float = 1.3, n_blocks: int = 6,
                     ka: int = 8, bq: int = 512, sg: int = 4,
                     ka_c: Optional[int] = None, sg_c: Optional[int] = None,
                     msplit: int = 1, patch_cap: int = 8192,
                     nsplit: int = 1, fast: bool = True,
                     interpret: bool = False):
    """One hierarchical render chunk against swg_prepare artifacts.

    Default window geometry (sg=4 subgroups of 128 queries, each with its
    own 1024-row window) holds zero-overflow on realistic ray batches whose
    sorted key spans are sparse in places, while the chain still runs full
    [hidden, 512] MXU tiles (docs/perf_notes.md ray-geometry correction).

    Returns (rgb, depth, fine_rgb, fine_depth, n_overflow) — n_overflow is
    the int32 count of stages (0..2) that overflowed their sorted windows
    and fell back to the slow exact path this chunk.

    ka_c widens the COARSE stage's windows independently (default 2*ka,
    capped at 16): the coarse stage has half the fine stage's query density
    over the same image, so its sorted subgroup spans are ~2x wider — equal
    windows silently push every coarse stage onto the fallback (found by the
    overflow counter on the round-2 bench geometry).
    """
    stage_c, stage_f, (h, w), w_pad, w_groups, (max_ka, n_freq) = prepared
    ka_c = min(2 * ka, 16) if ka_c is None else ka_c
    assert max(ka, ka_c) <= max_ka, (
        f"window ka={ka}/ka_c={ka_c} exceeds the prepared image "
        f"padding ({max_ka} groups) — re-run swg_prepare with ka="
        f"{max(ka, ka_c)} or the window would read clamped groups")
    sg_c = sg if sg_c is None else sg_c
    key_c, key_f = jax.random.split(key)

    world_points, z = sampling.sample_along_ray(key_c, ray_o, ray_d, near,
                                                far, n_samples)
    cam_dirs = projection.world_to_camera_directions_mv(ray_d,
                                                        src_extrinsics_inv)
    params_c, grouped_c, prep_c = stage_c
    chroma, density, of_c = swg_field(params_c, world_points, z, cam_dirs,
                                      grouped_c, w_pad, w_groups, (h, w),
                                      src_intrinsics, src_extrinsics_inv,
                                      n_blocks, n_freq=n_freq,
                                      ka=ka_c, bq=bq, sg=sg_c,
                                      msplit=msplit, patch_cap=patch_cap,
                                      fast=fast, nsplit=nsplit,
                                      interpret=interpret,
                                      stage_prep=prep_c)
    rgb, depth, weights = render.volumetric_render(z, density, chroma)

    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    z_fine = sampling.sample_pdf(key_f, z_mid, weights[..., 1:-1], n_samples)
    # one variadic sort of the concatenated z's beats sort_small+merge_sorted
    # at this shape (docs/perf_notes.md fine-z microprobes)
    all_z = jnp.sort(jnp.concatenate([z, z_fine], axis=-1), axis=-1)
    fine_points = (ray_o[:, :, None, :]
                   + all_z[..., None] * ray_d[:, :, None, :])
    params_f, grouped_f, prep_f = stage_f
    fine_chroma, fine_density, of_f = swg_field(
        params_f, fine_points, all_z, cam_dirs, grouped_f, w_pad, w_groups,
        (h, w), src_intrinsics, src_extrinsics_inv, n_blocks,
        n_freq=n_freq, ka=ka, bq=bq,
        sg=sg, msplit=msplit, patch_cap=patch_cap, fast=fast, nsplit=nsplit,
        interpret=interpret, stage_prep=prep_f)
    fine_rgb, fine_depth, _ = render.volumetric_render(all_z, fine_density,
                                                       fine_chroma)
    n_overflow = of_c.astype(jnp.int32) + of_f.astype(jnp.int32)
    return rgb, depth, fine_rgb, fine_depth, n_overflow


def derive_window_knobs(ray_o, ray_d, src_intrinsics, src_extrinsics_inv,
                        image_hw, n_samples: int = 64, near: float = 0.3,
                        far: float = 1.3, bq: int = 1024, sg: int = 8,
                        sg_c: int = 8, patch_cap: int = 8192,
                        ka_min: int = 2, ka_max: int = 16, seed: int = 0):
    """Derive (ka, ka_c) from the ACTUAL serving geometry (host-side numpy).

    The sorted-window kernel's window width ka is a throughput/overflow
    trade that depends entirely on the source/target camera baseline: it
    sets how many 128-row image groups each 128-query subgroup's sorted key
    span must fit in (swg_rows' span check). Static knobs tuned on one
    camera ring (docs/perf_notes.md round-3 sweep) silently over- or
    under-window other rigs. This probe replays the kernel's exact span
    math on the caller's real rays — stratified coarse samples and a
    3x-density fine-stage surrogate (pdf-resampled fine z's cluster at
    coarse weight peaks, widening tail spans; the patch_cap/2 budget leaves
    headroom for that) — and returns the narrowest windows whose expected
    overflow the block-level patch repair absorbs.

    ray_o/ray_d: [N, 3] or [B, N, 3] target rays; src_intrinsics/
    src_extrinsics_inv: [4, 4] (or leading-batched) view-0 camera.
    Returns {"ka", "ka_c", "stats"}.
    """
    from .inference import _swg_window_spans  # shared exact span replica

    ray_o = np.asarray(ray_o, np.float64).reshape(-1, 3)
    ray_d = np.asarray(ray_d, np.float64).reshape(-1, 3)
    k4 = np.asarray(src_intrinsics, np.float64).reshape(-1, 4, 4)[0]
    e4 = np.asarray(src_extrinsics_inv, np.float64).reshape(-1, 4, 4)[0]
    h, w = image_hw
    w_pad = ((w + 127) // 128) * 128
    rng = np.random.default_rng(seed)
    n_rays = ray_o.shape[0]

    def stage_keys(n_stage):
        # stratified z like core.sampling.sample_along_ray
        edges = np.linspace(near, far, n_stage + 1)[:-1]
        z = edges + rng.uniform(size=(n_rays, n_stage)) * (
            (far - near) / n_stage)
        pts = ray_o[:, None, :] + z[..., None] * ray_d[:, None, :]
        ph = np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1)
        proj = (ph @ e4.T) @ k4.T
        xy = proj[..., :2] / np.maximum(proj[..., 2:3], projection.Z_EPS)
        xy = np.clip(xy, -projection.PIXEL_CLIP, projection.PIXEL_CLIP)
        x0 = np.clip(np.floor(np.clip(xy[..., 0], 0.0, w - 1.0)), 0.0, w - 2.0)
        y0 = np.clip(np.floor(np.clip(xy[..., 1], 0.0, h - 1.0)), 0.0, h - 2.0)
        return (y0 * w_pad + x0).reshape(-1).astype(np.int64)

    def pick(keys, n_stage, sub):
        # one call = one chunk: the kernel sorts this whole batch together
        budget = max(patch_cap // 2, sub)
        for ka in range(ka_min, ka_max + 1):
            n_over_q = max(_swg_window_spans(keys, n_rays * n_stage, sub, ka))
            if n_over_q <= budget:
                return ka, n_over_q
        return ka_max, max(
            _swg_window_spans(keys, n_rays * n_stage, sub, ka_max))

    ka, over_f = pick(stage_keys(3 * n_samples), 3 * n_samples, bq // sg)
    ka_c, over_c = pick(stage_keys(n_samples), n_samples, bq // sg_c)
    return {"ka": ka, "ka_c": ka_c, "stats": {
        "fine_expected_overflow_q": over_f,
        "coarse_expected_overflow_q": over_c,
    }}


def swg_render_rays(params, ray_o, ray_d, src_images, src_intrinsics,
                    src_extrinsics_inv, combined_features, key,
                    n_samples: int = 64, near: float = 0.3, far: float = 1.3,
                    n_blocks: int = 6, pd: int = 120, ka: int = 6,
                    bq: int = 512, nsplit: int = 1, fast: bool = True,
                    interpret: bool = False):
    """Hierarchical render with the sorted-window fused kernel (1-view
    serving; parity with MVNeRFRenderer.render_rays semantics plus a
    trailing n_overflow counter). Single-shot convenience wrapper; chunk
    loops should call swg_prepare once and swg_render_chunk per chunk."""
    b, v = src_images.shape[:2]
    assert b == 1 and v == 1, "swg path is the 1-view serving configuration"
    prepared = swg_prepare(params, src_images, combined_features,
                           n_blocks=n_blocks, pd=pd, ka=ka, fast=fast)
    return swg_render_chunk(prepared, ray_o, ray_d, src_intrinsics,
                            src_extrinsics_inv, key, n_samples=n_samples,
                            near=near, far=far, n_blocks=n_blocks, ka=ka,
                            bq=bq, nsplit=nsplit, fast=fast,
                            interpret=interpret)
