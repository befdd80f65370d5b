"""Kernel-only (bq, sg, ka, msplit) sweep for swg_gather_mlp_t.

Times JUST the fused kernel on pre-sorted fine-shape queries (524k, honest
bench geometry) across window configurations, to separate the chain floor
from window-DMA and gather-matmul costs. Spans that overflow a config's
window time identically (the gather truncates), so every config is timeable;
overflow VALIDITY per config is reported separately from host-side spans.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_swg_sweep.py
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

from tcnerf.core import projection, sampling
from tcnerf.core.rays import get_specific_rays
from tcnerf.data.synthetic import camera_ring
from tcnerf.ops.pallas.swg import (LANE, head_pad_transposed, prepare_image,
                                   swg_gather_mlp_t, transpose_chain_weights)

K = 8


def main():
    hidden, n_blocks = 128, 6
    dt = jnp.bfloat16
    h, w, n_rays, n_samples = 480, 640, 4096, 192
    rng = np.random.default_rng(0)
    cfg, tgt = camera_ring(2, height=h, width=w)[:2]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)
    pix_x = rng.uniform(0, w - 1, n_rays).astype(np.float32)
    pix_y = rng.uniform(0, h - 1, n_rays).astype(np.float32)
    ro, rd = get_specific_rays(pix_x, pix_y, tgt["pose"],
                               tgt["intrinsics"].reshape(3, 3))
    ray_o = jnp.asarray(ro[None]); ray_d = jnp.asarray(rd[None])
    intr = jnp.asarray(np.broadcast_to(k4, (1, 1, 4, 4)).copy())
    ext = jnp.asarray(np.broadcast_to(ext_inv, (1, 1, 4, 4)).copy())
    world, z = sampling.sample_along_ray(jax.random.PRNGKey(0), ray_o, ray_d,
                                         0.3, 1.3, n_samples)
    pixel_xy, cam_points = projection.project_points_mv(world, intr, ext)
    cam_dirs = projection.world_to_camera_directions_mv(ray_d, ext)
    coords = np.asarray(pixel_xy).reshape(-1, 2)
    pos = np.asarray(cam_points[..., :3]).reshape(-1, 3)
    dirs = np.asarray(jnp.broadcast_to(
        cam_dirs[:, :, :, None, :], (1, 1, n_rays, n_samples, 3))).reshape(-1, 3)
    n = coords.shape[0]

    img = jnp.asarray(rng.normal(size=(h, w, hidden)).astype(np.float32), dt)
    head_k = jnp.asarray(rng.normal(size=(120, hidden)).astype(np.float32) * .05)
    flat = []
    for _ in range(n_blocks):
        flat += [jnp.asarray(rng.normal(size=(hidden, hidden))
                             .astype(np.float32) * .05, dt),
                 jnp.zeros(hidden, dt)] * 2
    flat += [jnp.asarray(rng.normal(size=(hidden, 4)).astype(np.float32) * .05,
                         dt), jnp.zeros(4, dt)]
    flat_t = transpose_chain_weights(tuple(flat))
    grouped, w_pad, w_groups = prepare_image(img, ka=4)
    img_t = jnp.transpose(grouped, (0, 2, 1))
    head_pt = head_pad_transposed(head_k, 3, 10).astype(dt)
    head_b = jnp.zeros((hidden,), jnp.float32)

    # host-side sort once (keys per the swg pipeline)
    x = np.clip(coords[:, 0], 0, w - 1.0)
    y = np.clip(coords[:, 1], 0, h - 1.0)
    x0 = np.clip(np.floor(x), 0, w - 2.0)
    y0 = np.clip(np.floor(y), 0, h - 2.0)
    keys = (y0.astype(np.int64) * w_pad + x0.astype(np.int64))
    order = np.argsort(keys, kind="stable")
    keys_s = keys[order]
    pdt_np = np.zeros((8, n), np.float32)
    pdt_np[0:3] = pos[order].T
    pdt_np[3:6] = dirs[order].T
    qx = np.floor((x - x0)[order] * 2048.0)
    qy = np.floor((y - y0)[order] * 2048.0)
    pdt_np[6] = qx * 2048.0 + qy
    pdt_np[7] = keys_s.astype(np.float32)
    pdt = jnp.asarray(pdt_np)

    import ast
    configs = ast.literal_eval(os.environ.get("SWG_SWEEP", "0")) or [
        (1024, 8, 6, 1),    # bench default
        (1024, 8, 6, 2),    # + interleaved chain slices
        (1024, 4, 8, 1),    # fewer, wider windows (sub=256)
        (1024, 2, 12, 1),   # sub=512
        (1024, 8, 4, 1),    # narrower windows (ka scaling probe)
        (2048, 16, 6, 1),   # bigger block, same sub=128
        (512, 4, 6, 1),     # round-2 style
        (1024, 8, 6, 4),    # msplit=4
    ]
    for bq, sg, ka, msplit in configs:
        sub = bq // sg
        sb = (keys_s[::sub] // LANE).astype(np.int32)
        span = keys_s[sub - 1::sub] - sb.astype(np.int64) * LANE
        n_over = int((span > ka * LANE - 2).sum())
        s_blocks = jnp.asarray(sb)

        @jax.jit
        def run(key, bq=bq, sg=sg, ka=ka, msplit=msplit, s_blocks=s_blocks):
            def step(c, k):
                salt = jax.random.uniform(k, ()) * 0
                out = swg_gather_mlp_t(
                    s_blocks, pdt + salt, img_t, head_pt, head_b, flat_t,
                    w_groups, n_blocks, n_freq=10, readout=True, ka=ka,
                    bq=bq, sg=sg, msplit=msplit)
                return c + out.astype(jnp.float32).sum() * 0, None
            acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                  jax.random.split(key, K))
            return acc

        _ = float(run(jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(jax.random.PRNGKey(0))
        _ = float(out)
        dtm = (time.perf_counter() - t0) / 3 / K
        print(f"bq={bq:5d} sg={sg:2d} ka={ka:2d} msplit={msplit}: "
              f"{dtm*1e3:7.3f} ms  (overflow subgroups {n_over}/{len(span)})",
              flush=True)


if __name__ == "__main__":
    main()
