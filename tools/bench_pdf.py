"""Micro-timing of the fine-z pipeline parts: sample_pdf, sort_small,
merge_sorted — each scan-amortized over 8 iterations at bench shape
(4096 rays x 64 samples). Identifies which of the ~11 ms (S_pdf - S_coarse
in bench_stages2.py) belongs to which op."""

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

N_ITERS = 8


def timeit_scan(fn, *args, iters=4):
    _ = float(fn(*args))
    _ = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * N_ITERS)


def main():
    from tcnerf.core import sampling
    from tcnerf.ops.sortmerge import merge_sorted, sort_small

    n_rays, n_samples = 4096, 64
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    z = jnp.asarray(np.sort(rng.uniform(0.3, 1.3, (1, n_rays, n_samples)),
                            axis=-1).astype(np.float32))
    zf = jnp.asarray(rng.uniform(0.3, 1.3, (1, n_rays, n_samples))
                     .astype(np.float32))
    zf_sorted = jnp.sort(zf, axis=-1)
    w = jnp.asarray(rng.uniform(0, 1, (1, n_rays, n_samples - 2))
                    .astype(np.float32))
    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    keys = jax.random.split(key, N_ITERS)

    out = {}

    @jax.jit
    def f_pdf(keys):
        def step(c, k):
            s = sampling.sample_pdf(k, z_mid, w, n_samples)
            return c + s.sum(), None
        acc, _ = jax.lax.scan(step, jnp.zeros(()), keys)
        return acc

    out["sample_pdf_ms"] = round(timeit_scan(f_pdf, keys) * 1e3, 2)

    @jax.jit
    def f_sort(keys):
        def step(c, k):
            # fold the key in so the sort input varies per step
            s = sort_small(zf + 1e-6 * k[0].astype(jnp.float32))
            return c + s.sum(), None
        acc, _ = jax.lax.scan(step, jnp.zeros(()), keys)
        return acc

    out["sort_small_ms"] = round(timeit_scan(f_sort, keys) * 1e3, 2)

    @jax.jit
    def f_merge(keys):
        def step(c, k):
            s = merge_sorted(z, zf_sorted + 1e-6 * k[0].astype(jnp.float32))
            return c + s.sum(), None
        acc, _ = jax.lax.scan(step, jnp.zeros(()), keys)
        return acc

    out["merge_sorted_ms"] = round(timeit_scan(f_merge, keys) * 1e3, 2)

    @jax.jit
    def f_jnp_sort(keys):
        def step(c, k):
            s = jnp.sort(jnp.concatenate(
                [z, zf + 1e-6 * k[0].astype(jnp.float32)], axis=-1), axis=-1)
            return c + s.sum(), None
        acc, _ = jax.lax.scan(step, jnp.zeros(()), keys)
        return acc

    out["jnp_sort_128_ms"] = round(timeit_scan(f_jnp_sort, keys) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
