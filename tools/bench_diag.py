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


if __name__ == "__main__" and not (os.environ.get("DIAG_ALIGN")
                                   or os.environ.get("DIAG_CORNERS")):
    main()


def alignment_probe():
    """Compare gather throughput for lane-aligned (256) vs misaligned (259)
    channel counts, and a split 256+3 double gather."""
    from tcnerf.ops.interpolate import bilinear_gather

    h, w = 480, 640
    n = 4096 * 192
    rng = np.random.default_rng(1)
    coords = jnp.asarray(rng.uniform(0, 600, (1, n, 2)), jnp.float32)
    def timeit_pull(f, *args, iters=5):
        # host-pull sync: block_until_ready does not sync through the tunnel
        _ = float(f(*args))
        _ = float(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _ = float(out)
        return (time.perf_counter() - t0) / iters

    out = {}
    for c in (256, 259, 384):
        img = jnp.asarray(rng.normal(size=(1, h, w, c)), jnp.bfloat16)
        f = jax.jit(lambda im, cc: bilinear_gather(im, cc)
                    .astype(jnp.float32).sum())
        out[f"gather_c{c}_ms"] = round(timeit_pull(f, img, coords) * 1e3, 2)

    img256 = jnp.asarray(rng.normal(size=(1, h, w, 256)), jnp.bfloat16)
    img3 = jnp.asarray(rng.normal(size=(1, h, w, 8)), jnp.bfloat16)

    def split(cc):
        return (bilinear_gather(img256, cc).astype(jnp.float32).sum()
                + bilinear_gather(img3, cc).astype(jnp.float32).sum())

    f = jax.jit(split)
    out["gather_split_256p8_ms"] = round(timeit_pull(f, coords) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("DIAG_ALIGN"):
    alignment_probe()


def corners_probe():
    """The gather is row-count-limited (~11ns/row; see DIAG_ALIGN numbers), so
    fold the 4 bilinear corners into ONE gathered row: precompute a corner-
    shifted concat image [H, W, 4C] (x+1 / y+1 / xy+1 shifts) and gather once
    per sample instead of 4 times."""
    h, w = 480, 640
    n = 4096 * 192
    rng = np.random.default_rng(1)
    coords = jnp.asarray(rng.uniform(0, 600, (1, n, 2)), jnp.float32)

    def timeit_pull(f, *args, iters=5):
        _ = float(f(*args))
        _ = float(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _ = float(out)
        return (time.perf_counter() - t0) / iters

    def one_row_gather(img4, cc):
        hh, ww = img4.shape[1], img4.shape[2]
        x = jnp.clip(cc[..., 0], 0.0, ww - 1.0)
        y = jnp.clip(cc[..., 1], 0.0, hh - 1.0)
        x0 = jnp.clip(jnp.floor(x), 0.0, ww - 2.0).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(y), 0.0, hh - 2.0).astype(jnp.int32)
        flat = img4.reshape(img4.shape[0], hh * ww, img4.shape[-1])
        rows = jnp.take_along_axis(flat, (y0 * ww + x0)[..., None], axis=1)
        return rows.astype(jnp.float32).sum()

    out = {}
    for c in (128, 259):
        img4 = jnp.asarray(rng.normal(size=(1, h, w, 4 * c)), jnp.bfloat16)
        f = jax.jit(one_row_gather)
        out[f"gather_1row_4x{c}_ms"] = round(timeit_pull(f, img4, coords) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("DIAG_CORNERS"):
    corners_probe()
