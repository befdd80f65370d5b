"""Pallas fused resmlp chain vs plain-XLA chain at bench scale.

524k rows (4096 rays x 128 fine samples) through 6 residual blocks + render
readout, bf16 weights. Scan-amortized over 4 iterations, host-pull synced.
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

N_ITERS = 4


def timeit_scan(fn, *args, iters=3):
    _ = float(fn(*args))
    _ = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * N_ITERS)


def main():
    from tcnerf.ops.pallas.resmlp import resmlp_reference, resmlp_rows

    n, d_in, hidden, n_blocks = 4096 * 128, 128, 128, 6
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def w(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1, dt)

    flat = [w((d_in, hidden)), w((hidden,))]
    for _ in range(n_blocks):
        flat += [w((hidden, hidden)), w((hidden,)),
                 w((hidden, hidden)), w((hidden,))]
    flat += [w((hidden, 4)), w((4,))]
    flat = tuple(flat)
    x = jnp.asarray(rng.normal(size=(n, d_in)).astype(np.float32), dt)

    out = {}

    @jax.jit
    def f_ref(x):
        def step(c, _):
            o = resmlp_reference(x + c.astype(dt), flat, n_blocks, readout=True)
            return c + o.astype(jnp.float32).sum() * 0, None
        acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(N_ITERS))
        return acc

    out["xla_chain_ms"] = round(timeit_scan(f_ref, x) * 1e3, 2)

    for tile, fast, nsplit in ((1024, False, 1), (1024, True, 1),
                               (1024, True, 2), (2048, True, 2),
                               (2048, True, 4), (4096, True, 4)):
        @jax.jit
        def f_pallas(x, tile=tile, fast=fast, nsplit=nsplit):
            def step(c, _):
                o = resmlp_rows(x + c.astype(dt), flat, n_blocks, readout=True,
                                tile=tile, fast=fast, nsplit=nsplit)
                return c + o.astype(jnp.float32).sum() * 0, None
            acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(N_ITERS))
            return acc

        tag = f"pallas_t{tile}_f{int(fast)}_s{nsplit}_ms"
        try:
            out[tag] = round(timeit_scan(f_pallas, x) * 1e3, 2)
        except Exception as e:  # noqa: BLE001 — report and continue
            out[tag] = f"FAILED: {type(e).__name__}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
