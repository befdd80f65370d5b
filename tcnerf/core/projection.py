"""World <-> camera projection for multi-view feature conditioning.

Reference semantics: src/lib/mvnerf/nerf_utils.py:64-105. The reference does an
einops transpose dance to express batched 4x4 matmuls; here each projection is
a single einsum which XLA lowers to one batched MXU matmul.
"""

from __future__ import annotations

import jax.numpy as jnp

from .prec import heinsum

PIXEL_CLIP = 1e6
Z_EPS = 1e-8


def project_points_mv(world_points: jnp.ndarray, src_intrinsics: jnp.ndarray,
                      src_extrinsics_inv: jnp.ndarray):
    """Project world points into every source view.

    world_points: [B, R, S, 3]; src_intrinsics / src_extrinsics_inv: [B, V, 4, 4].
    Returns (pixel_xy [B, V, R, S, 2], camera_points [B, V, R, S, 4] homogeneous).
    """
    ones = jnp.ones_like(world_points[..., :1])
    wph = jnp.concatenate([world_points, ones], axis=-1)  # [B, R, S, 4]
    cam = heinsum("bvij,brsj->bvrsi", src_extrinsics_inv, wph)
    proj = heinsum("bvij,bvrsj->bvrsi", src_intrinsics, cam)
    pixel_xy = proj[..., :2] / jnp.maximum(proj[..., 2:3], Z_EPS)
    pixel_xy = jnp.clip(pixel_xy, -PIXEL_CLIP, PIXEL_CLIP)
    return pixel_xy, cam


def world_to_camera_directions_mv(world_dirs: jnp.ndarray,
                                  src_extrinsics_inv: jnp.ndarray) -> jnp.ndarray:
    """Rotate world direction vectors into each source camera frame.

    world_dirs: [B, R, 3]; src_extrinsics_inv: [B, V, 4, 4] -> [B, V, R, 3].

    NOTE: the reference homogenizes directions with w=1 and keeps only xyz of
    (E^-1 @ d_h) — i.e. rotation *plus translation* leaks into the direction
    (nerf_utils.py:95-104). We reproduce that exactly for parity.
    """
    ones = jnp.ones_like(world_dirs[..., :1])
    dh = jnp.concatenate([world_dirs, ones], axis=-1)  # [B, R, 4]
    cam = heinsum("bvij,brj->bvri", src_extrinsics_inv, dh)
    return cam[..., :3]


def project_probe_points(points: jnp.ndarray, src_intrinsics: jnp.ndarray,
                         src_extrinsics_inv: jnp.ndarray):
    """Project grasp-probe translations [B, N, P, 3] into each view.

    Returns (pixel_xy [B, V, N, P, 2], camera_points [B, V, N, P, 3]).
    Reference: src/lib/grasp_mvnerf/model.py:125-132.
    """
    ones = jnp.ones_like(points[..., :1])
    ph = jnp.concatenate([points, ones], axis=-1)
    cam = heinsum("bvij,bnpj->bvnpi", src_extrinsics_inv, ph)
    proj = heinsum("bvij,bvnpj->bvnpi", src_intrinsics, cam)
    pixel_xy = proj[..., :2] / jnp.maximum(proj[..., 2:3], Z_EPS)
    pixel_xy = jnp.clip(pixel_xy, -PIXEL_CLIP, PIXEL_CLIP)
    return pixel_xy, cam[..., :3]


def rotate_directions(rotations: jnp.ndarray, direction: jnp.ndarray,
                      src_extrinsics_inv: jnp.ndarray) -> jnp.ndarray:
    """Probe z-axis directions into camera frames (with the reference's w=1 quirk).

    rotations: [B, N, P, 3, 3] pose rotations; direction: [3] gripper axis;
    src_extrinsics_inv: [B, V, 4, 4] -> [B, V, N, P, 3].
    Reference: src/lib/grasp_mvnerf/model.py:139-142.
    """
    d = heinsum("bnpij,j->bnpi", rotations, direction)
    dh = jnp.concatenate([d, jnp.ones_like(d[..., :1])], axis=-1)
    cam = heinsum("bvij,bnpj->bvnpi", src_extrinsics_inv, dh)
    return cam[..., :3]
