"""Incremental stage split of the swg render chunk (the bench hot loop).

Times nested prefixes of swg_render_chunk so differences isolate each
stage's marginal cost: sampling/projection -> +coarse field -> +composite/
pdf/z-sort -> full (+fine field+composite). Scan-amortized, host-synced.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_chunk.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tcnerf.core import projection, render, sampling
from tcnerf.models.fused import swg_field, swg_prepare
from tcnerf.models.renderer import MVNeRFRenderer

K = 8


def main():
    h, w, n_rays, n_samples, n_blocks = 480, 640, 4096, 64, 6
    rng = np.random.default_rng(0)
    from tcnerf.core.rays import get_specific_rays
    from tcnerf.data.synthetic import camera_ring
    cfg, tgt = camera_ring(2, height=h, width=w)[:2]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)
    # the bench's honest geometry: rays through real target pixels
    pix_x = rng.uniform(0, w - 1, n_rays).astype(np.float32)
    pix_y = rng.uniform(0, h - 1, n_rays).astype(np.float32)
    ro, rd = get_specific_rays(pix_x, pix_y, tgt["pose"],
                               tgt["intrinsics"].reshape(3, 3))
    ray_o = ro[None].astype(np.float32)
    ray_d = rd[None].astype(np.float32)
    KA = int(os.environ.get("SWG_KA", "4"))
    KA_C = int(os.environ.get("SWG_KA_C", "12"))
    BQ = int(os.environ.get("SWG_BQ", "1024"))
    SG = int(os.environ.get("SWG_SG", "8"))
    SG_C = int(os.environ.get("SWG_SG_C", "8"))
    MSPLIT = int(os.environ.get("SWG_MSPLIT", "4"))
    PCAP = int(os.environ.get("SWG_PATCH_CAP", "8192"))
    src_images = rng.uniform(size=(1, 1, h, w, 3)).astype(np.float32)
    src_intr = jnp.asarray(np.broadcast_to(k4, (1, 1, 4, 4)).copy())
    src_ext = jnp.asarray(np.broadcast_to(ext_inv, (1, 1, 4, 4)).copy())
    features = jnp.asarray(
        rng.normal(size=(1, 1, h, w, 256)).astype(np.float32), jnp.bfloat16)
    src_images = jnp.asarray(src_images)
    ray_o, ray_d = jnp.asarray(ray_o), jnp.asarray(ray_d)

    model = MVNeRFRenderer(
        n_views=1, n_samples=n_samples, n_features=256, near=0.3, far=1.3,
        original_image_size=(h, w), fusion="without", n_blocks=n_blocks,
        hidden_size=128, dtype=jnp.bfloat16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        ray_o, ray_d, src_images, src_intr, src_ext, features,
        method="render_rays")
    params = variables["params"]

    def stage(level, prepared, key):
        stage_c, stage_f, hw, w_pad, w_groups = prepared[:5]
        key_c, key_f = jax.random.split(key)
        world_points, z = sampling.sample_along_ray(
            key_c, ray_o, ray_d, 0.3, 1.3, n_samples)
        cam_dirs = projection.world_to_camera_directions_mv(ray_d, src_ext)
        if level == 0:
            return world_points.astype(jnp.float32).sum() + cam_dirs.sum()
        params_c, grouped_c, prep_c = stage_c
        chroma, density, _ = swg_field(
            params_c, world_points, z, cam_dirs, grouped_c, w_pad, w_groups,
            hw, src_intr, src_ext, n_blocks, ka=KA_C, bq=BQ, sg=SG_C,
            msplit=MSPLIT, patch_cap=PCAP, stage_prep=prep_c)
        if level == 1:
            return chroma.sum() + density.sum()
        rgb, depth, weights = render.volumetric_render(z, density, chroma)
        z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
        z_fine = sampling.sample_pdf(key_f, z_mid, weights[..., 1:-1],
                                     n_samples)
        all_z = jnp.sort(jnp.concatenate([z, z_fine], axis=-1), axis=-1)
        fine_points = (ray_o[:, :, None, :]
                       + all_z[..., None] * ray_d[:, :, None, :])
        if level == 2:
            return rgb.sum() + fine_points.sum()
        params_f, grouped_f, prep_f = stage_f
        fine_chroma, fine_density, _ = swg_field(
            params_f, fine_points, all_z, cam_dirs, grouped_f, w_pad,
            w_groups, hw, src_intr, src_ext, n_blocks, ka=KA, bq=BQ, sg=SG,
            msplit=MSPLIT, patch_cap=PCAP, stage_prep=prep_f)
        fine_rgb, fine_depth, _ = render.volumetric_render(
            all_z, fine_density, fine_chroma)
        return fine_rgb.sum()

    results = {}
    for level, name in [(0, "sample+project"), (1, "+coarse field"),
                        (2, "+composite/pdf/zsort"), (3, "full")]:
        @jax.jit
        def run(key, level=level):
            prepared = swg_prepare(params, src_images, features,
                                   n_blocks=n_blocks, ka=4)

            def step(c, k):
                return c + stage(level, prepared, k).astype(jnp.float32) * 0, None
            acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                  jax.random.split(key, K))
            return acc

        _ = float(run(jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(jax.random.PRNGKey(0))
        _ = float(out)
        dt = (time.perf_counter() - t0) / 3 / K
        results[name] = dt
        print(f"{name:22s} {dt*1e3:8.3f} ms", flush=True)

    prev = 0.0
    print("-- marginal --")
    for name, dt in results.items():
        print(f"{name:22s} {((dt - prev))*1e3:8.3f} ms")
        prev = dt


if __name__ == "__main__":
    main()
