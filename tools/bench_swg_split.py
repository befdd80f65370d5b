"""Exact sort/kernel/unsort marginals of the swg pipeline at bench shapes.

Levels (each adds one stage; differences are marginal costs):
  pack    — keys/fracs + payload pack for the transposed kernel
  sort    — + the 10-operand lax.sort
  kernel  — + swg_gather_mlp_t (gather + geometry head + chain + readout)
  unsort  — + the narrow output un-permute sort (== full swg_rows)

Geometry: the bench's honest target-pixel rays (bench.py), coarse (262k)
and fine-approx (524k uniform z) query sets. Scan-amortized, host-synced.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_swg_split.py
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


def setup(n_samples):
    h, w, n_rays = 480, 640, 4096
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
    b, r, s = 1, n_rays, n_samples
    coords = pixel_xy.reshape(-1, 2)
    pos = cam_points[..., :3].reshape(-1, 3)
    dirs = jnp.broadcast_to(cam_dirs[:, :, :, None, :],
                            (b, 1, r, s, 3)).reshape(-1, 3)
    return coords, pos, dirs, (h, w)


def main():
    hidden, n_blocks = 128, 6
    dt = jnp.bfloat16
    rng = np.random.default_rng(1)
    h, w = 480, 640
    img = jnp.asarray(rng.normal(size=(h, w, hidden)).astype(np.float32), dt)
    head_k = jnp.asarray(rng.normal(size=(120, hidden)).astype(np.float32) * .05)
    head_b = jnp.zeros((hidden,), jnp.float32)
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

    bq = int(os.environ.get("SWG_BQ", "1024"))
    sg = int(os.environ.get("SWG_SG", "8"))
    msplit = int(os.environ.get("SWG_MSPLIT", "1"))

    for label, n_samples, ka in (("coarse-262k", 64, 12),
                                 ("fine-524k", 128 + 64, 6)):
        coords, pos, dirs, _ = setup(n_samples)
        n = coords.shape[0]

        def pipeline(level, coords, pos, dirs, salt):
            x = jnp.clip(coords[:, 0] + salt * 0, 0.0, w - 1.0)
            y = jnp.clip(coords[:, 1], 0.0, h - 1.0)
            x0 = jnp.clip(jnp.floor(x), 0.0, w - 2.0)
            y0 = jnp.clip(jnp.floor(y), 0.0, h - 2.0)
            ax = x - x0
            ay = y - y0
            keys = (y0.astype(jnp.int32) * w_pad + x0.astype(jnp.int32))
            orig = jnp.arange(n, dtype=jnp.int32)
            if level == 0:
                return (keys.astype(jnp.float32).sum() + ax.sum() + ay.sum()
                        + pos.sum() + dirs.sum())
            qx = jnp.floor(ax * 2048.0)
            qy = jnp.floor(ay * 2048.0)
            srt = jax.lax.sort(
                (keys, orig, qx * 2048.0 + qy,
                 pos[:, 0], pos[:, 1], pos[:, 2],
                 dirs[:, 0], dirs[:, 1], dirs[:, 2]), num_keys=1)
            (keys_s, orig_s, axay_s, px, py, pz, dx, dy, dz) = srt
            sub = bq // sg
            s_blocks = keys_s[::sub] // LANE
            if level == 1:
                return (keys_s.astype(jnp.float32).sum() + px.sum()
                        + s_blocks.astype(jnp.float32).sum())
            pdt = jnp.stack([px, py, pz, dx, dy, dz, axay_s,
                             keys_s.astype(jnp.float32)], axis=0)
            out_t = swg_gather_mlp_t(
                s_blocks, pdt, img_t, head_pt, head_b, flat_t, w_groups,
                n_blocks, n_freq=10, readout=True, ka=ka, bq=bq, sg=sg,
                msplit=msplit)
            if level == 2:
                return out_t.sum()
            out_s = jnp.transpose(out_t)
            cols = [out_s[:, j] for j in range(out_s.shape[1])]
            unsorted = jax.lax.sort((orig_s, *cols), num_keys=1)
            return sum(u.sum() for u in unsorted[1:])

        print(f"== {label} (bq={bq} sg={sg} ka={ka} msplit={msplit})")
        prev = 0.0
        for level, name in ((0, "pack"), (1, "sort"), (2, "kernel"),
                            (3, "unsort")):
            @jax.jit
            def run(key, level=level):
                def step(c, k):
                    salt = jax.random.uniform(k, ()) * 0
                    return c + pipeline(level, coords, pos, dirs,
                                        salt).astype(jnp.float32) * 0, None
                acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                      jax.random.split(key, K))
                return acc

            _ = float(run(jax.random.PRNGKey(0)))
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(jax.random.PRNGKey(0))
            _ = float(out)
            dtm = (time.perf_counter() - t0) / 3 / K
            print(f"  {name:8s} {dtm*1e3:8.3f} ms  (marginal "
                  f"{(dtm-prev)*1e3:+8.3f})", flush=True)
            prev = dtm


if __name__ == "__main__":
    main()
