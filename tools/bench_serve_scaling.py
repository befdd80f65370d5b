"""Weak-scaling harness for sharded full-image serving (r3 VERDICT item 3).

`parallel/serve.py render_image_sharded` is the declared scale-out path past
the measured ~350-380k rays/s single-chip composed floor
(docs/perf_notes.md); this tool measures how it actually scales: the same
full-image render over meshes of 1, 2, 4, ... devices, reporting rays/s,
parallel efficiency, and a fitted overhead model

    t(n) = t_work / n + t_fixed

(t_fixed = per-call dispatch + replicated prep + collective overhead; under
weak scaling the render work divides perfectly because chunks are
independent — the ONLY cross-device interaction is the output all-gather).

On the 8-device virtual CPU mesh every "device" time-shares the SAME host
core, so t(n) cannot drop below t(1): what the virtual run measures is the
SHARDING OVERHEAD per mesh size (collectives + per-shard dispatch — the
`sharding_overhead_vs_1dev` field), which is the part of the scaling story
that transfers to real hardware. Speedup itself needs real chips: on a
real multi-chip slice the same tool (or `TCNERF_BENCH_SHARDED=1 python
bench.py`) reports deployable rays/s, parallel efficiency, and the fitted
t(n) = t_work/n + t_fixed overhead model.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_serve_scaling.py [--height 120 --width 160]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def run(height, width, n_samples, n_blocks, hidden, chunk, iters):
    from tcnerf.data.synthetic import camera_ring
    from tcnerf.models.renderer import MVNeRFRenderer
    from tcnerf.parallel.mesh import make_mesh
    from tcnerf.parallel.serve import render_image_sharded

    model = MVNeRFRenderer(
        n_views=1, n_samples=n_samples, n_features=32, near=0.55, far=1.8,
        original_image_size=(height, width), fusion="without",
        n_blocks=n_blocks, hidden_size=hidden,
        vit_size=(32, 32), vit_patch=16, vit_dim=32, vit_heads=2,
        vit_hooks=(1, 2, 3, 4))

    rng = np.random.default_rng(0)
    cfg, tgt = camera_ring(2, height=height, width=width)[:2]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)
    src_images = jnp.asarray(rng.uniform(size=(1, 1, height, width, 3)),
                             jnp.float32)
    src_intr = jnp.asarray(k4, jnp.float32)[None, None]
    src_ext = jnp.asarray(ext_inv, jnp.float32)[None, None]
    feats = jnp.asarray(rng.normal(size=(1, 1, height, width, 32)),
                        jnp.float32)
    ro = jnp.zeros((1, 8, 3), jnp.float32)
    rd = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 8, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        ro, rd, src_images, src_intr, src_ext, feats, method="render_rays")
    tgt_pose = jnp.asarray(tgt["pose"], jnp.float32)
    tgt_intr3 = jnp.asarray(tgt["intrinsics"].reshape(3, 3), jnp.float32)

    n_rays = height * width
    n_avail = len(jax.devices())
    # shared-core virtual mesh? (xla_force_host_platform_device_count gives
    # n "devices" on however many real cores the host has)
    virtual = (jax.devices()[0].platform == "cpu"
               and n_avail > (os.cpu_count() or 1))
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    rows = []
    ref_rgb = None
    for n in sizes:
        mesh = make_mesh(n)

        def render():
            rgb, depth = render_image_sharded(
                mesh, model.apply, variables, src_images, src_intr, src_ext,
                feats, tgt_pose, tgt_intr3, jax.random.PRNGKey(9), height,
                width, chunk=chunk)
            return np.asarray(rgb)  # host pull = sync

        rgb = render()  # compile + warmup
        if ref_rgb is None:
            ref_rgb = rgb
        else:
            np.testing.assert_allclose(rgb, ref_rgb, rtol=1e-4, atol=1e-5)
        t0 = time.perf_counter()
        for _ in range(iters):
            render()
        dt = (time.perf_counter() - t0) / iters
        rows.append((n, dt))
        row = {"devices": n, "ms_per_image": round(dt * 1e3, 1),
               "rays_per_sec": round(n_rays / dt, 1),
               "parity_vs_1dev": "ok"}
        if virtual:
            # time-shared core: ideal t(n) == t(1); the excess is the
            # sharding overhead (collectives + per-shard dispatch), the
            # transferable part of the measurement
            row["sharding_overhead_vs_1dev"] = round(dt / rows[0][1] - 1, 3)
        else:
            row["parallel_efficiency"] = round(rows[0][1] / (n * dt), 3)
        print(json.dumps(row), flush=True)

    # overhead model t(n) = t_work/n + t_fixed — only meaningful when the
    # devices actually compute in parallel
    if len(rows) >= 2 and not virtual:
        ns = np.asarray([r[0] for r in rows], np.float64)
        ts = np.asarray([r[1] for r in rows], np.float64)
        A = np.stack([1.0 / ns, np.ones_like(ns)], axis=1)
        (t_work, t_fixed), *_ = np.linalg.lstsq(A, ts, rcond=None)
        print(json.dumps({
            "overhead_model": "t(n) = t_work/n + t_fixed",
            "t_work_ms": round(t_work * 1e3, 1),
            "t_fixed_ms": round(t_fixed * 1e3, 1),
            "fixed_fraction_at_max": round(
                float(t_fixed / ts[-1]) if ts[-1] else 0.0, 3),
            "extrapolated_rays_per_sec_64dev": round(
                n_rays / (t_work / 64 + t_fixed), 1),
        }), flush=True)
    elif len(rows) >= 2:
        print(json.dumps({
            "note": "shared-core virtual mesh: t(n) ~ t(1) + overhead(n); "
                    "speedup needs real devices",
            "overhead_at_max_mesh": round(rows[-1][1] / rows[0][1] - 1, 3),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    a = ap.parse_args()
    run(a.height, a.width, a.samples, a.blocks, a.hidden, a.chunk, a.iters)
