"""Pose-optimization (grasp serving) throughput: corner vs scattered gather.

Full-scale GraspEBM (256 features, 480x640, 6 blocks, 42 probes), 4096
initial guesses, 8 sync ascent steps — the GraspPipeline.infer hot loop.
Prints one JSON line per gather mode with guesses*steps/sec.
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

N_GUESSES = 4096
N_STEPS = 8
WORKSPACE = ((0.3, 0.7), (-0.25, 0.25), (0.0, 0.3))


def run(corner: bool):
    from tcnerf.models.grasp import GraspEBM
    from tcnerf.opt.pose_optimizer import PoseOptimizer
    from tcnerf.data.synthetic import camera_ring

    h, w = 480, 640
    rng = np.random.default_rng(0)
    cfg = camera_ring(1, height=h, width=w)[0]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    imgs = jnp.asarray(rng.uniform(size=(1, 1, h, w, 3)), jnp.float32)
    intr = jnp.asarray(k4, jnp.float32)[None, None]
    ext = jnp.asarray(np.linalg.inv(cfg["pose"]), jnp.float32)[None, None]

    model = GraspEBM(n_views=1, n_features=256, original_image_size=(h, w),
                     n_5d_poses=7, n_blocks=6, hidden_size=128,
                     corner_gather=corner, dtype=jnp.bfloat16)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, 8, 1, 1))
    params = model.init(jax.random.PRNGKey(0), poses, imgs, intr, ext)["params"]
    feats = jnp.asarray(rng.normal(size=(1, 1, h, w, 256)), jnp.bfloat16)

    opt = PoseOptimizer(apply_fn=model.apply, params=params,
                        workspace_bounds=WORKSPACE,
                        n_initial_guesses=N_GUESSES, n_images=1, n_views=1,
                        init_lr_t=0.02, decay_t=0.95, clip_translation=True)
    inputs = (imgs, intr, ext)
    state = opt.init_state(opt.generate_initial_guesses(rng=0))

    def once():
        s2, trace = opt.optimize_pose(state, inputs, feats, (True, True),
                                      N_STEPS)
        return float(jnp.sum(s2.translations))  # host pull = real sync

    _ = once()
    _ = once()
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = once()
    dt = time.perf_counter() - t0
    per_sec = iters * N_GUESSES * N_STEPS / dt
    print(json.dumps({"mode": "corner" if corner else "scattered",
                      "guess_steps_per_s": round(per_sec, 1),
                      "ms_per_ascent_step":
                      round(dt / (iters * N_STEPS) * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    mode = os.environ.get("GRASP_BENCH_MODE", "both")
    if mode in ("both", "scattered"):
        run(False)
    if mode in ("both", "corner"):
        run(True)
