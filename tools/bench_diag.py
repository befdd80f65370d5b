"""Diagnostic: decompose fused-render time into MLP-only vs gather-dominated.

Runs three jitted programs at bench scale and prints per-part rays/sec:
  1. mlp_only      — the coarse+fine MLP chains on constant features
  2. gather_only   — the 4-corner bilinear gathers alone
  3. full          — the real render_rays (reference for the two above)
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


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    jax.block_until_ready(fn(*args))  # second warmup
    # block EVERY call: the axon tunnel appears to resolve block_until_ready
    # on enqueued-but-unfinished work when calls are pipelined
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from tcnerf.nn.mlp import MVResNetMLPEmbedding
    from tcnerf.nn.blocks import RenderReadout
    from tcnerf.ops.interpolate import bilinear_gather
    import flax.linen as nn

    h, w, c = 480, 640, 259
    n_rays, n_samples = 4096, 192
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    class Field(nn.Module):
        @nn.compact
        def __call__(self, pos, dirs, feats):
            emb = MVResNetMLPEmbedding(n_blocks=6, hidden_size=128, n_views=1,
                                       embed_direction_vector=True,
                                       dtype=dt, name="mlp")(pos, dirs, feats)
            return RenderReadout(4, dtype=dt, name="ro")(emb)

    pos = jnp.asarray(rng.uniform(0, 1, (1, n_rays, n_samples, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(1, n_rays, n_samples, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(1, n_rays, n_samples, c)), dt)
    field = Field()
    params = field.init(jax.random.PRNGKey(0), pos, dirs, feats)["params"]

    f_mlp = jax.jit(lambda p, a, b, f: field.apply({"params": p}, a, b, f)[1].sum())
    t_mlp = timeit(f_mlp, params, pos, dirs, feats)

    image = jnp.asarray(rng.normal(size=(1, h, w, c)), dt)
    coords = jnp.asarray(rng.uniform(0, 600, (1, n_rays * n_samples, 2)),
                         jnp.float32)
    f_gather = jax.jit(lambda img, cc: bilinear_gather(img, cc).astype(jnp.float32).sum())
    t_gather = timeit(f_gather, image, coords)

    result = {
        "mlp_rays_per_s": round(n_rays / t_mlp, 1),
        "gather_rays_per_s": round(n_rays / t_gather, 1),
        "t_mlp_ms": round(t_mlp * 1e3, 2),
        "t_gather_ms": round(t_gather * 1e3, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__" and not os.environ.get("DIAG_ALIGN"):
    main()


def alignment_probe():
    """Compare gather throughput for lane-aligned (256) vs misaligned (259)
    channel counts, and a split 256+3 double gather."""
    from tcnerf.ops.interpolate import bilinear_gather

    h, w = 480, 640
    n = 4096 * 192
    rng = np.random.default_rng(1)
    coords = jnp.asarray(rng.uniform(0, 600, (1, n, 2)), jnp.float32)
    out = {}
    for c in (256, 259, 384):
        img = jnp.asarray(rng.normal(size=(1, h, w, c)), jnp.bfloat16)
        f = jax.jit(lambda im, cc: bilinear_gather(im, cc))
        out[f"gather_c{c}_ms"] = round(timeit(f, img, coords, iters=5) * 1e3, 2)

    img256 = jnp.asarray(rng.normal(size=(1, h, w, 256)), jnp.bfloat16)
    img3 = jnp.asarray(rng.normal(size=(1, h, w, 8)), jnp.bfloat16)

    def split(cc):
        return (bilinear_gather(img256, cc), bilinear_gather(img3, cc))

    f = jax.jit(split)
    out["gather_split_256p8_ms"] = round(timeit(f, coords, iters=5) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("DIAG_ALIGN"):
    alignment_probe()
