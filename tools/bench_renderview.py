"""Full-image (480x640) render_view timing on the real chip.

The reference renders a full view as 600 sequential host-loop chunks of 512
rays through tf.function re-entry (model_v0.py:243-281). Here the whole
image renders as one jitted lax.map over 4096-ray swg chunks
(models/inference.py _render_all_rays_swg). Prints seconds per full image
and the equivalent rays/s.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_renderview.py
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


def main():
    from tcnerf.data.synthetic import camera_ring
    from tcnerf.models.inference import _render_all_rays_swg
    from tcnerf.models.renderer import MVNeRFRenderer

    h, w = 480, 640
    # TCNERF_RV_DTYPE=float32 reproduces the training-validation condition
    # (f32 model + features; swg_prepare downcasts the stream to bf16)
    feat_dtype = jnp.dtype(os.environ.get("TCNERF_RV_DTYPE", "bfloat16"))
    rng = np.random.default_rng(0)
    cfgs = camera_ring(2, height=h, width=w)
    model = MVNeRFRenderer(
        n_views=1, n_samples=64, n_features=256, near=0.3, far=1.3,
        original_image_size=(h, w), fusion="without", n_blocks=6,
        hidden_size=128, dtype=feat_dtype)

    src_images = jnp.asarray(
        rng.uniform(size=(1, 1, h, w, 3)).astype(np.float32))
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfgs[0]["intrinsics"].reshape(3, 3)
    src_intr = jnp.asarray(np.broadcast_to(k4, (1, 1, 4, 4)).copy())
    src_ext = jnp.asarray(np.linalg.inv(cfgs[0]["pose"]).astype(
        np.float32))[None, None]
    features = jnp.asarray(
        rng.normal(size=(1, 1, h, w, 256)).astype(np.float32), feat_dtype)

    ray_o = jnp.zeros((1, 16, 3))
    ray_d = jnp.ones((1, 16, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        ray_o, ray_d, src_images, src_intr, src_ext, features,
        method="render_rays")

    tgt_pose = jnp.asarray(cfgs[1]["pose"], jnp.float32)
    tgt_intr3 = jnp.asarray(cfgs[1]["intrinsics"].reshape(3, 3), jnp.float32)

    chunk = int(os.environ.get("TCNERF_RV_CHUNK", "8192"))

    def run(key):
        rgb, depth, n_of = _render_all_rays_swg(
            variables["params"], src_images, src_intr, src_ext, features,
            tgt_pose, tgt_intr3, key, h, w, chunk, 64, 0.3, 1.3, 6)
        return rgb

    out = run(jax.random.PRNGKey(0))
    _ = float(jnp.sum(out.astype(jnp.float32)))   # compile + sync
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(jax.random.PRNGKey(i))
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"render_view 480x640 (swg, 64+128 samples): {dt*1e3:.1f} ms/image"
          f"  ({h*w/dt/1e3:.1f}k rays/s)")


if __name__ == "__main__":
    main()
