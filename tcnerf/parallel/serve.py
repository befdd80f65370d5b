"""Multi-chip full-image rendering: the serving-side scaling path.

Training shards rays per step (explicit.py / mesh.py); this module shards a
FULL-IMAGE render over the whole mesh: the image's ray chunks are split
across every device (both mesh axes flattened — an image render has no batch
dimension, so 'data' and 'ray' both act as ray-parallel here), each device
lax.maps over its local chunks through the renderer, and only per-device
image slices ride back. Features are encoded once and replicated (O(1) per
image vs O(pixels) render work — same trade as explicit.py documents for
training).

The reference renders one 480x640 view as 600 *sequential host-loop* chunks
on one GPU (model_v0.py:243-281); here a v5e-8 renders the same view with 8
chunks in flight, one jitted program, no host round-trips.

Works on any mesh size (1-device mesh == models.inference flax path) and on
the virtual CPU mesh for testing (tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.rays import get_rays_jax
from .explicit import _NO_CHECK, shard_map

MESH_AXES = ("data", "ray")


def render_image_sharded(mesh: Mesh, apply_fn, variables, src_images,
                         src_intrinsics, src_extrinsics_inv,
                         combined_features, tgt_pose, tgt_intrinsics3, rng,
                         height: int, width: int, chunk: int = 512):
    """Render the full target view with ray chunks sharded over the mesh.

    Same per-chunk math and per-chunk RNG keys as the single-device
    `models.inference._render_all_rays` (parity-tested on the 8-device CPU
    mesh), so device count does not change the rendered image.
    Returns (fine_rgb [H, W, 3] f32, fine_depth [H, W]).
    """
    n_dev = mesh.size
    rays_o, rays_d = get_rays_jax(width, height, tgt_pose, tgt_intrinsics3)
    n = height * width
    # pad to a whole number of chunks per device
    per_dev = -(-n // (n_dev * chunk)) * chunk
    n_pad = n_dev * per_dev - n
    flat_o = jnp.concatenate(
        [rays_o.reshape(-1, 3), jnp.zeros((n_pad, 3), rays_o.dtype)])
    flat_d = jnp.concatenate(
        [rays_d.reshape(-1, 3), jnp.ones((n_pad, 3), rays_d.dtype)])
    n_chunks = n_dev * per_dev // chunk
    chunks_o = flat_o.reshape(n_chunks, 1, chunk, 3)
    chunks_d = flat_d.reshape(n_chunks, 1, chunk, 3)
    keys = jax.random.split(rng, n_chunks)

    spec_chunks = P(MESH_AXES)          # leading chunk axis over the mesh
    spec_rep = P()

    def local_render(variables, src_images, src_intr, src_ext, combined,
                     chunks_o, chunks_d, keys):
        def render_chunk(args):
            ro, rd, key = args
            rgb, depth, fine_rgb, fine_depth = apply_fn(
                variables, ro, rd, src_images, src_intr, src_ext, combined,
                rngs={"sampling": key}, method="render_rays")
            return fine_rgb[0], fine_depth[0]

        return jax.lax.map(render_chunk, (chunks_o, chunks_d, keys))

    fn = shard_map(
        local_render, mesh=mesh,
        in_specs=(spec_rep,) * 5 + (spec_chunks, spec_chunks, spec_chunks),
        out_specs=(spec_chunks, spec_chunks), **_NO_CHECK)
    fine_rgb, fine_depth = jax.jit(fn)(
        variables, src_images, src_intrinsics, src_extrinsics_inv,
        combined_features, chunks_o, chunks_d, keys)
    fine_rgb = fine_rgb.reshape(-1, 3)[:n].reshape(height, width, 3)
    fine_depth = fine_depth.reshape(-1)[:n].reshape(height, width)
    return fine_rgb, fine_depth
