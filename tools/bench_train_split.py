"""Stage-marginal split of the batch-8 NeRF train step (round-5 diagnosis).

The round-4 bench measured train_step_ms_b8 = 529.7 ms at 6.5% MFU and the
FLOP accounting blamed the encoder (83% of algorithmic FLOPs) — but bf16
encoder moved wall clock only 4%, so the step is NOT FLOP-bound and the FLOP
split does not say where the TIME goes. This tool measures it:

  encoder_fwd        combine_features forward only (b8, 480x640)
  encoder_fwdbwd     + backward (grad wrt params)
  ray_fwd            chunked render_rays forward, features precomputed
  ray_fwdbwd_stop    + backward wrt params only (stop_gradient on features:
                     NO scatter-add into the [B,H,W,256] feature image)
  ray_fwdbwd_full    + backward wrt params AND features (the real training
                     dataflow: take_along_axis vjp = scatter-add)
  full_step          the actual nerf_train_step (cross-check: should be
                     ~ encoder_fwdbwd + ray_fwdbwd_full + optimizer)

ray_fwdbwd_full - ray_fwdbwd_stop isolates the feature-image scatter-add;
encoder_fwdbwd vs the rest decides whether the round-5 training-throughput
work belongs in the encoder (VERDICT hypothesis) or in the gather/scatter
path. Timing ends with a host transfer (block_until_ready does not sync
through the axon tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tcnerf.utils.cache import enable_compile_cache

enable_compile_cache()

BATCH = int(os.environ.get("SPLIT_BATCH", "8"))
N_RAYS = 512
H, W = 480, 640
RAY_CHUNK = int(os.environ.get("SPLIT_RAY_CHUNK", "128"))


def timeit(fn, *args, iters=3):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from tcnerf.core.rays import get_specific_rays
    from tcnerf.data.synthetic import camera_ring
    from tcnerf.models import training as T
    from tcnerf.models.renderer import MVNeRFRenderer

    model = MVNeRFRenderer(
        n_views=1, n_samples=64, n_features=256, near=0.3, far=1.3,
        original_image_size=(H, W), fusion="without", n_blocks=6,
        hidden_size=128, corner_gather=False, remat=True)

    rng = np.random.default_rng(2)
    cfg, tgt = camera_ring(2, height=H, width=W)[:2]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = cfg["intrinsics"].reshape(3, 3)
    ext_inv = np.linalg.inv(cfg["pose"]).astype(np.float32)
    pix_x = rng.uniform(0, W - 1, (BATCH, N_RAYS)).astype(np.float32)
    pix_y = rng.uniform(0, H - 1, (BATCH, N_RAYS)).astype(np.float32)
    ro = np.empty((BATCH, N_RAYS, 3), np.float32)
    rd = np.empty((BATCH, N_RAYS, 3), np.float32)
    for b in range(BATCH):
        ro[b], rd[b] = get_specific_rays(pix_x[b], pix_y[b], tgt["pose"],
                                         tgt["intrinsics"].reshape(3, 3))
    inputs = (jnp.asarray(ro), jnp.asarray(rd),
              jnp.asarray(rng.uniform(size=(BATCH, 1, H, W, 3)), jnp.float32),
              jnp.asarray(np.broadcast_to(k4, (BATCH, 1, 4, 4))),
              jnp.asarray(np.broadcast_to(ext_inv, (BATCH, 1, 4, 4))))
    labels = jnp.asarray(rng.uniform(size=(BATCH, N_RAYS, 3)), jnp.float32)
    state = T.create_train_state(model, jax.random.PRNGKey(0), inputs)
    params = state.params
    ray_o, ray_d, src_images, src_intr, src_ext = inputs
    key = jax.random.PRNGKey(1)

    # ---------------------------------------------------------- encoder
    flat_images = src_images.reshape((BATCH,) + src_images.shape[2:])

    @jax.jit
    def encoder_fwd(params):
        out, _ = state.apply_fn({"params": params}, flat_images,
                                method="combine_features")
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def encoder_fwdbwd(params):
        return jax.grad(encoder_fwd)(params)["visual_features"][
            "conv_features"]["stem_conv"]["kernel"]

    print(f"encoder_fwd      b{BATCH}: {timeit(encoder_fwd, params):8.1f} ms",
          flush=True)
    print(f"encoder_fwdbwd   b{BATCH}: {timeit(encoder_fwdbwd, params):8.1f} ms",
          flush=True)

    # ---------------------------------------------------------- ray path
    combined, _ = jax.jit(
        lambda p: state.apply_fn({"params": p}, flat_images,
                                 method="combine_features"))(params)
    combined = combined.reshape((BATCH, 1) + combined.shape[1:])
    n_chunks = N_RAYS // RAY_CHUNK

    def chunk_axes(x):
        return x.reshape((BATCH, n_chunks, RAY_CHUNK) + x.shape[2:]
                         ).swapaxes(0, 1)

    xs = (chunk_axes(ray_o), chunk_axes(ray_d), chunk_axes(labels),
          jax.random.split(key, n_chunks))

    def ray_loss(params, feats):
        def body(carry, x):
            ro_, rd_, lab, k = x
            rgb, _, fine_rgb, _ = state.apply_fn(
                {"params": params}, ro_, rd_, src_images, src_intr,
                src_ext, feats, rngs={"sampling": k}, method="render_rays")
            return carry + T.mse(lab, rgb) + T.mse(lab, fine_rgb), None

        total, _ = jax.lax.scan(
            jax.checkpoint(body, prevent_cse=False), jnp.zeros(()), xs)
        return total / n_chunks

    @jax.jit
    def ray_fwd(params, feats):
        return ray_loss(params, feats)

    @jax.jit
    def ray_fwdbwd_stop(params, feats):
        g = jax.grad(lambda p: ray_loss(p, jax.lax.stop_gradient(feats)))(
            params)
        return jax.tree_util.tree_leaves(g["fine_embedding"])[0]

    @jax.jit
    def ray_fwdbwd_full(params, feats):
        gp, gf = jax.grad(ray_loss, argnums=(0, 1))(params, feats)
        return (jax.tree_util.tree_leaves(gp["fine_embedding"])[0],
                jnp.sum(gf.astype(jnp.float32)))

    print(f"ray_fwd          b{BATCH}: "
          f"{timeit(ray_fwd, params, combined):8.1f} ms", flush=True)
    print(f"ray_fwdbwd_stop  b{BATCH}: "
          f"{timeit(ray_fwdbwd_stop, params, combined):8.1f} ms", flush=True)
    print(f"ray_fwdbwd_full  b{BATCH}: "
          f"{timeit(ray_fwdbwd_full, params, combined):8.1f} ms", flush=True)

    # ---------------------------------------------------------- full step
    @jax.jit
    def full(state, rng):
        st, m = T.nerf_train_step(state, inputs, labels, rng)
        return m["loss"]

    print(f"full_step        b{BATCH}: {timeit(full, state, key):8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
