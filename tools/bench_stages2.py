"""Scan-amortized stage timing of the corner-gather hierarchical render.

Unlike bench_stages.py (one dispatch per stage — includes ~8 ms tunnel
overhead per call), every stage here runs as a lax.scan over 8 chunks like
bench.py, so the numbers are per-chunk device time at the bench operating
point. Stages:
  S_coarse      sample -> project -> corner gather -> coarse MLP -> composite
  S_pdf         S_coarse + sample_pdf + sortmerge (fine z, no fine field)
  S_full        full render_rays (= bench.py per-chunk)
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

N_CHUNKS = 8


def timeit_scan(fn, *args, iters=4):
    _ = float(fn(*args))
    _ = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * N_CHUNKS)


def main():
    from tcnerf.core import projection, render, sampling
    from tcnerf.models.renderer import MVNeRFRenderer
    from tcnerf.ops.interpolate import bilinear_gather_corners, make_corner_image
    from tcnerf.ops.sortmerge import merge_sorted, sort_small
    from tcnerf.data.synthetic import camera_ring

    h, w = 480, 640
    n_rays, n_samples = 4096, 64
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    cfg = camera_ring(1, height=h, width=w)[0]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)

    ray_d = rng.normal(size=(1, n_rays, 3)).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    ray_o = jnp.asarray(np.broadcast_to(cfg["pose"][:3, 3].astype(np.float32),
                                        ray_d.shape).copy())
    ray_d = jnp.asarray(ray_d)
    src_images = jnp.asarray(rng.uniform(size=(1, 1, h, w, 3)), jnp.float32)
    src_intr = jnp.asarray(np.broadcast_to(k4, (1, 1, 4, 4)).copy())
    src_ext = jnp.asarray(np.broadcast_to(ext_inv, (1, 1, 4, 4)).copy())
    features = jnp.asarray(rng.normal(size=(1, 1, h, w, 256)), jnp.bfloat16)
    normalized = (src_images * 2 - 1).astype(jnp.bfloat16)

    model = MVNeRFRenderer(
        n_views=1, n_samples=n_samples, n_features=256, near=0.3, far=1.3,
        original_image_size=(h, w), fusion="without", n_blocks=6,
        hidden_size=128, dtype=jnp.bfloat16)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        ray_o, ray_d, src_images, src_intr, src_ext, features,
        method="render_rays")["params"]

    apply = lambda method, *a: model.apply({"params": params}, *a,
                                           method=method)
    combined = jnp.concatenate(
        [normalized, features], axis=-1).reshape(1, h, w, 259)

    def coarse_eval(key):
        corner = make_corner_image(
            apply(lambda m, img: m.coarse_embedding.project_image(img),
                  combined))
        pts, z = sampling.sample_along_ray(key, ray_o, ray_d, 0.3, 1.3,
                                           n_samples)
        pix, cam = projection.project_points_mv(pts, src_intr, src_ext)
        feats = bilinear_gather_corners(corner, pix.reshape(1, -1, 2))
        feats = feats.reshape(1, 1, n_rays, n_samples, -1)
        cam_dirs = projection.world_to_camera_directions_mv(ray_d, src_ext)
        dirs = jnp.broadcast_to(cam_dirs[:, :, :, None, :],
                                (1, 1, n_rays, n_samples, 3))
        flat = lambda x: x.reshape((1, n_rays, n_samples, x.shape[-1]))
        emb = apply(lambda m, *a: m.coarse_embedding(*a,
                                                     features_projected=True),
                    flat(cam[..., :3]), flat(dirs), flat(feats))
        chroma, density = apply(lambda m, e: m.coarse_readout(e), emb)
        return z, chroma, density

    out = {}

    @jax.jit
    def s_coarse(keys):
        def chunk(carry, key):
            z, chroma, density = coarse_eval(key)
            rgb, depth, weights = render.volumetric_render(z, density, chroma)
            return carry + rgb.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(chunk, jnp.zeros(()), keys)
        return acc

    @jax.jit
    def s_pdf(keys):
        def chunk(carry, key):
            z, chroma, density = coarse_eval(key)
            rgb, depth, weights = render.volumetric_render(z, density, chroma)
            z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
            z_fine = sampling.sample_pdf(jax.random.fold_in(key, 1), z_mid,
                                         weights[..., 1:-1], n_samples)
            all_z = merge_sorted(z, sort_small(z_fine))
            return carry + all_z.sum() + rgb.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(chunk, jnp.zeros(()), keys)
        return acc

    @jax.jit
    def s_full(keys):
        def chunk(carry, key):
            outs = model.apply({"params": params}, ray_o, ray_d, src_images,
                               src_intr, src_ext, features,
                               rngs={"sampling": key}, method="render_rays")
            return carry + outs[2].astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(chunk, jnp.zeros(()), keys)
        return acc

    keys = jax.random.split(key, N_CHUNKS)
    out["S_coarse_ms"] = round(timeit_scan(s_coarse, keys) * 1e3, 2)
    out["S_pdf_ms"] = round(timeit_scan(s_pdf, keys) * 1e3, 2)
    out["S_full_ms"] = round(timeit_scan(s_full, keys) * 1e3, 2)
    out["full_rays_per_s"] = round(n_rays / (out["S_full_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
