"""Tuned binned-gather render benchmark: larger tiles, tighter capacity.

The (8,8)/cap4 configuration ran the MLP on 4.1x padded rows and lost 4x
overall; this sweeps (16,16) tiles at capacity 1.5 and 2.0 on the full
hierarchical render. Prints one JSON line per configuration.
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


def main():
    from tcnerf.models.renderer import MVNeRFRenderer
    from tools.binned_gather_experiment import binned_render_rays
    from tcnerf.data.synthetic import camera_ring

    h, w = 480, 640
    n_rays = 4096
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

    model = MVNeRFRenderer(
        n_views=1, n_samples=64, n_features=256, near=0.3, far=1.3,
        original_image_size=(h, w), fusion="without", n_blocks=6,
        hidden_size=128, dtype=jnp.bfloat16)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        ray_o, ray_d, src_images, src_intr, src_ext, features,
        method="render_rays")["params"]

    n_chunks = 8
    keys = jax.random.split(key, n_chunks)

    for tile, cap in (((16, 16), 1.5), ((16, 16), 2.0)):
        @jax.jit
        def render_many(params, keys):
            def chunk(carry, key):
                out = binned_render_rays(
                    params, ray_o, ray_d, src_images, src_intr, src_ext,
                    features, key, n_samples=64, near=0.3, far=1.3, n_blocks=6,
                    tile=tile, capacity_factor=cap)
                return carry + jnp.sum(out[2].astype(jnp.float32)), None

            acc, _ = jax.lax.scan(chunk, jnp.zeros(()), keys)
            return acc

        _ = float(render_many(params, keys))  # compile + warmup (host sync)
        n_iters = 4
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = render_many(params, keys)
        _ = float(out)
        dt = time.perf_counter() - t0
        rays_per_sec = n_iters * n_chunks * n_rays / dt
        print(json.dumps({"tile": tile, "capacity_factor": cap,
                          "rays_per_s": round(rays_per_sec, 1)}), flush=True)


if __name__ == "__main__":
    main()
