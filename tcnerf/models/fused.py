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

import jax
import jax.numpy as jnp

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
                interpret: bool = False):
    """Chroma/density via the Pallas chain (1-view). Shapes as renderer._field."""
    b, r, s, _ = world_points.shape
    pixel_xy, cam_points = projection.project_points_mv(
        world_points, src_intrinsics, src_extrinsics_inv)
    feats = gather_projection_features(normalized_images, combined_features,
                                       pixel_xy)  # [B, 1, R, S, C+3]
    dirs = jnp.broadcast_to(cam_dirs[:, :, :, None, :], (b, 1, r, s, 3))

    x = jnp.concatenate([
        positional_encoding(cam_points[..., :3], n_freq),
        positional_encoding(dirs, n_freq),
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
    from ..ops import binned_gather as bg

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
    from ..ops import binned_gather as bg

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
    from ..ops.sortmerge import merge_sorted, sort_small
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
