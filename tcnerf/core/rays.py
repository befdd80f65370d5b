"""Ray generation (pinhole camera back-projection) and pixel sampling.

Two flavors:
  * numpy host-side helpers used by the data layer (mirror of reference
    src/lib/mvnerf/nerf_utils.py:15-46);
  * jnp device-side variants used inside jitted pipelines so full-image
    rendering never round-trips through the host.

Conventions: `extrinsics` is camera-to-world (the camera "pose"); pixel coords
are (u, v) = (column, row); intrinsics is the 3x3 (or padded 4x4) pinhole K.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .prec import heinsum


# ---------------------------------------------------------------- numpy (host)

def get_specific_rays(u, v, extrinsics, intrinsics, norm_direction_vector=True):
    """Back-project pixels (u, v) through a pinhole camera into world rays.

    Returns (rays_o [N, 3], rays_d [N, 3]). Reference: nerf_utils.py:27-35.
    """
    u = np.asarray(u, dtype=np.float32)
    v = np.asarray(v, dtype=np.float32)
    pixels = np.stack((u, v, np.ones_like(u)), axis=0)
    k_inv = np.linalg.inv(np.asarray(intrinsics, dtype=np.float64)[:3, :3])
    rays_d = (np.asarray(extrinsics)[:3, :3] @ k_inv @ pixels).T.astype(np.float32)
    if norm_direction_vector:
        rays_d = rays_d / np.linalg.norm(rays_d, axis=1, keepdims=True)
    rays_o = np.broadcast_to(
        np.asarray(extrinsics, dtype=np.float32)[:3, -1], rays_d.shape
    )
    return rays_o, rays_d


def get_rays(image_width, image_height, extrinsics, intrinsics, norm_direction_vector=True):
    """All-pixel rays for a camera: ([H, W, 3] origins, [H, W, 3] directions).

    Reference: nerf_utils.py:15-24.
    """
    u, v = np.meshgrid(
        np.arange(image_width, dtype=np.float32),
        np.arange(image_height, dtype=np.float32),
        indexing="xy",
    )
    rays_o, rays_d = get_specific_rays(
        u.reshape(-1), v.reshape(-1), extrinsics, intrinsics, norm_direction_vector
    )
    shape = (image_height, image_width, 3)
    return rays_o.reshape(shape), rays_d.reshape(shape)


def bbox_biased_sample(rng, n_sample, bboxes, image_height, image_width, in_box_p=0.8):
    """Sample (row, col) pixel coords, `in_box_p` fraction inside the bbox.

    `bboxes` is (r0, c0, r1, c1). Returns int array [n_sample, 2] of (row, col).
    Reference: nerf_utils.py:38-46 (plus explicit rng for determinism).
    """
    rng = np.random.default_rng(rng) if not isinstance(rng, np.random.Generator) else rng
    n_inside = int(n_sample * in_box_p)
    n_random = n_sample - n_inside
    bboxes = np.asarray(bboxes)
    in_samples = rng.integers(bboxes[:2], bboxes[2:], (n_inside, 2))
    random_samples = rng.integers(0, (image_height, image_width), size=(n_random, 2))
    return np.concatenate([in_samples, random_samples], axis=0)


# ----------------------------------------------------------------- jnp (device)

def get_rays_jax(image_width, image_height, extrinsics, intrinsics,
                 norm_direction_vector=True):
    """Device-side all-pixel ray generation; static H/W so it jits cleanly."""
    u, v = jnp.meshgrid(
        jnp.arange(image_width, dtype=jnp.float32),
        jnp.arange(image_height, dtype=jnp.float32),
        indexing="xy",
    )
    pixels = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)  # [H, W, 3]
    k_inv = jnp.linalg.inv(intrinsics[:3, :3])
    rays_d = heinsum("ij,jk,hwk->hwi", extrinsics[:3, :3], k_inv, pixels)
    if norm_direction_vector:
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(extrinsics[:3, 3], rays_d.shape)
    return rays_o, rays_d
