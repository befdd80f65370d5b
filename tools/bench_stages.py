"""Stage-by-stage timing of the hierarchical render to locate the slow op.

Stages (each a separate jitted program, timed with hard host sync):
  A  projection only
  B  projection + bilinear gather
  C  B + coarse MLP + composite
  D  C + sample_pdf + sort (fine z)
  E  full render_rays (reference)
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=5):
    # block_until_ready does not synchronize through the axon tunnel; the only
    # reliable fence is a host transfer, so every fn returns a scalar and the
    # timed region ends with float(out) (device queue is FIFO, so the final
    # pull waits for all queued iterations).
    for _ in range(2):
        _ = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / iters


def main():
    from tcnerf.core import projection, render, sampling
    from tcnerf.models.renderer import MVNeRFRenderer
    from tcnerf.ops.interpolate import gather_projection_features

    h, w = 480, 640
    n_rays, n_samples = 4096, 64
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    from tcnerf.data.synthetic import camera_ring
    cfg = camera_ring(1, height=h, width=w)[0]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)

    ray_d = rng.normal(size=(1, n_rays, 3)).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    ray_o = np.broadcast_to(cfg["pose"][:3, 3].astype(np.float32),
                            ray_d.shape).copy()
    src_images = jnp.asarray(rng.uniform(size=(1, 1, h, w, 3)), jnp.float32)
    src_intr = jnp.asarray(np.broadcast_to(k4, (1, 1, 4, 4)).copy())
    src_ext = jnp.asarray(np.broadcast_to(ext_inv, (1, 1, 4, 4)).copy())
    features = jnp.asarray(rng.normal(size=(1, 1, h, w, 256)), jnp.bfloat16)
    normalized = (src_images * 2 - 1).astype(jnp.bfloat16)
    ray_o = jnp.asarray(ray_o)
    ray_d = jnp.asarray(ray_d)

    model = MVNeRFRenderer(
        n_views=1, n_samples=n_samples, n_features=256, near=0.3, far=1.3,
        original_image_size=(h, w), fusion="without", n_blocks=6,
        hidden_size=128, dtype=jnp.bfloat16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        ray_o, ray_d, src_images, src_intr, src_ext, features,
        method="render_rays")
    params = variables["params"]

    out = {}

    @jax.jit
    def stage_a(key):
        pts, z = sampling.sample_along_ray(key, ray_o, ray_d, 0.3, 1.3,
                                           n_samples)
        pix, cam = projection.project_points_mv(pts, src_intr, src_ext)
        return pix.astype(jnp.float32).sum()

    out["A_project_ms"] = round(timeit(stage_a, key) * 1e3, 2)

    @jax.jit
    def stage_b(key):
        pts, z = sampling.sample_along_ray(key, ray_o, ray_d, 0.3, 1.3,
                                           n_samples)
        pix, cam = projection.project_points_mv(pts, src_intr, src_ext)
        feats = gather_projection_features(normalized, features, pix)
        return feats.astype(jnp.float32).sum()

    out["B_gather_ms"] = round(timeit(stage_b, key) * 1e3, 2)

    def coarse_eval(key):
        pts, z = sampling.sample_along_ray(key, ray_o, ray_d, 0.3, 1.3,
                                           n_samples)
        pix, cam = projection.project_points_mv(pts, src_intr, src_ext)
        feats = gather_projection_features(normalized, features, pix)
        cam_dirs = projection.world_to_camera_directions_mv(ray_d, src_ext)
        dirs = jnp.broadcast_to(cam_dirs[:, :, :, None, :],
                                (1, 1, n_rays, n_samples, 3))
        flat = lambda x: x.reshape((1, n_rays, n_samples, x.shape[-1]))
        emb = model.apply({"params": params}, flat(cam[..., :3]), flat(dirs),
                          flat(feats),
                          method=lambda m, *a: m.coarse_embedding(*a))
        chroma, density = model.apply(
            {"params": params}, emb, method=lambda m, e: m.coarse_readout(e))
        return z, chroma, density

    @jax.jit
    def stage_c(key):
        z, chroma, density = coarse_eval(key)
        rgb, depth, weights = render.volumetric_render(z, density, chroma)
        return rgb.sum()

    out["C_coarse_mlp_ms"] = round(timeit(stage_c, key) * 1e3, 2)

    @jax.jit
    def stage_d(key):
        z, chroma, density = coarse_eval(key)
        rgb, depth, weights = render.volumetric_render(z, density, chroma)
        z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
        z_fine = sampling.sample_pdf(jax.random.fold_in(key, 1), z_mid,
                                     weights[..., 1:-1], n_samples)
        all_z = jnp.sort(jnp.concatenate([z, z_fine], axis=-1), axis=-1)
        return all_z.sum() + rgb.sum()

    out["D_pdf_sort_ms"] = round(timeit(stage_d, key) * 1e3, 2)

    @jax.jit
    def stage_e(key):
        outs = model.apply({"params": params}, ray_o, ray_d, src_images,
                           src_intr, src_ext, features,
                           rngs={"sampling": key}, method="render_rays")
        return outs[2].astype(jnp.float32).sum()

    out["E_full_ms"] = round(timeit(stage_e, key) * 1e3, 2)
    out["E_rays_per_s"] = round(n_rays / (out["E_full_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
