"""Sorted-window-gather fused kernel vs the XLA gather + Pallas-chain path.

Bench-scale stage: 524k queries (4096 rays x 128 fine samples) against a
480x640x128 pre-projected image, 6 blocks + readout, bf16. Scan-amortized,
host-pull synced. Also checks numerical parity on the chip.

Run: PYTHONPATH=/root/repo python tools/bench_swg.py
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

from tcnerf.core.encoding import positional_encoding
from tcnerf.ops.interpolate import bilinear_gather
from tcnerf.ops.pallas.resmlp import resmlp_rows
from tcnerf.ops.pallas.swg import prepare_image, swg_rows

K_INNER = 8


def timeit(fn, *args, iters=3):
    out = fn(*args)
    _ = float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / K_INNER


def main():
    rng = np.random.default_rng(0)
    H, W, C, n_blocks = 480, 640, 128, 6
    N = 4096 * 128
    dt = jnp.bfloat16

    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32), dt)
    coords = jnp.asarray(np.stack([rng.uniform(0, W - 1, N),
                                   rng.uniform(0, H - 1, N)], -1)
                         .astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    head_k = jnp.asarray(rng.normal(size=(120, C)).astype(np.float32) * .05)
    head_b = jnp.zeros((C,), jnp.float32)
    flat = []
    for _ in range(n_blocks):
        flat += [jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * .05,
                             dt), jnp.zeros(C, dt)] * 2
    flat += [jnp.asarray(rng.normal(size=(C, 4)).astype(np.float32) * .05, dt),
             jnp.zeros(4, dt)]
    flat = tuple(flat)

    grouped, w_pad, w_groups = prepare_image(img, ka=4)

    def swg_once(coords, pos, dirs, fast=True, nsplit=1):
        out, ov = swg_rows(grouped, w_pad, w_groups, W, H, coords, pos, dirs,
                           head_k, head_b, flat, n_blocks, ka=4, bq=512,
                           fast=fast, nsplit=nsplit)
        return out, ov

    def xla_once(coords, pos, dirs, fast=True):
        feats = bilinear_gather(img[None], coords[None])[0]
        enc = jnp.concatenate([positional_encoding(pos, 10),
                               positional_encoding(dirs, 10)], -1)
        h0 = (enc.astype(dt) @ head_k.astype(dt) + head_b.astype(dt)
              + feats).astype(dt)
        return resmlp_rows(h0, flat, n_blocks, readout=True, tile=1024,
                           skip_input=True, fast=fast)

    # parity on chip
    o1, ov = swg_once(coords, pos, dirs)
    o2 = xla_once(coords, pos, dirs)
    o1, o2 = np.asarray(o1, np.float32), np.asarray(o2, np.float32)
    rel = np.max(np.abs(o1 - o2)) / max(np.max(np.abs(o2)), 1e-6)
    print(f"overflow={bool(ov)} parity_rel={rel:.4f}")

    def amortize(fn, **kw):
        @jax.jit
        def run(coords, pos, dirs):
            def step(c, _):
                o = fn(coords + c.astype(coords.dtype) * 0, pos, dirs, **kw)
                o = o[0] if isinstance(o, tuple) else o
                return c + o.astype(jnp.float32).sum() * 0, None
            acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(K_INNER))
            return acc
        return run

    for name, fn, kw in [
            ("xla+chain fast", xla_once, {}),
            ("swg fast ns1", swg_once, {}),
            ("swg fast ns2", swg_once, {"nsplit": 2}),
    ]:
        try:
            dtime = timeit(amortize(fn, **kw), coords, pos, dirs)
            print(f"{name:18s} {dtime*1e3:8.3f} ms  "
                  f"({N/dtime/1e6:6.1f} Mqueries/s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAIL: {str(e).split(chr(10))[0][:150]}")


if __name__ == "__main__" and not os.environ.get("SWG_BREAKDOWN"):
    main()


def breakdown():
    """Time each SWG pipeline component separately (scan-amortized)."""
    rng = np.random.default_rng(0)
    H, W, C, n_blocks = 480, 640, 128, 6
    N = 4096 * 128
    dt = jnp.bfloat16
    from tcnerf.ops.pallas.swg import swg_gather_mlp, prepare_image
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32), dt)
    grouped, w_pad, w_groups = prepare_image(img, ka=4)
    keys = jnp.sort(jnp.asarray(rng.integers(0, (H - 2) * w_pad + W - 2, N),
                                jnp.int32))
    orig = jnp.arange(N, dtype=jnp.int32)
    fr = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    h0g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32), dt)
    head_k = jnp.asarray(rng.normal(size=(120, C)).astype(np.float32) * .05, dt)
    flat = []
    for _ in range(n_blocks):
        flat += [jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * .05,
                             dt), jnp.zeros(C, dt)] * 2
    flat += [jnp.asarray(rng.normal(size=(C, 4)).astype(np.float32) * .05, dt),
             jnp.zeros(4, dt)]
    flat = tuple(flat)
    s_blocks = keys[::512] // 128
    o4 = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))

    def op_sort10(c, i):
        outs = jax.lax.sort((keys + i, orig, fr[:, 0], fr[:, 1],
                             pos[:, 0], pos[:, 1], pos[:, 2],
                             dirs[:, 0], dirs[:, 1], dirs[:, 2]), num_keys=1)
        return c + outs[2].sum() * 0

    def op_sort4(c, i):
        outs = jax.lax.sort((keys + i, orig, fr[:, 0], fr[:, 1]), num_keys=1)
        return c + outs[2].sum() * 0

    def op_unsort5(c, i):
        outs = jax.lax.sort((orig + i, o4[:, 0], o4[:, 1], o4[:, 2],
                             o4[:, 3]), num_keys=1)
        return c + outs[1].sum() * 0

    def op_posenc_h0(c, i):
        from tcnerf.core.encoding import positional_encoding
        enc = jnp.concatenate([positional_encoding(pos + c, 10),
                               positional_encoding(dirs, 10)], -1)
        h0 = enc.astype(dt) @ head_k
        return c + h0.astype(jnp.float32).sum() * 0

    def op_kernel(c, i):
        out = swg_gather_mlp(s_blocks, keys[:, None],
                             fr + c.astype(fr.dtype) * 0, h0g, grouped, flat,
                             w_groups, n_blocks, readout=True, ka=4, bq=512,
                             fast=True, nsplit=1)
        return c + out.sum() * 0

    K = 8
    for name, op in [("sort10", op_sort10), ("sort4", op_sort4),
                     ("unsort5", op_unsort5), ("posenc+h0", op_posenc_h0),
                     ("kernel", op_kernel)]:
        @jax.jit
        def run():
            def step(c, i):
                return op(c, i), None
            acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(K))
            return acc
        _ = float(run())
        t0 = time.perf_counter()
        for _ in range(3):
            out = run()
        _ = float(out)
        dtime = (time.perf_counter() - t0) / 3 / K
        print(f"{name:12s} {dtime*1e3:8.3f} ms")


if __name__ == "__main__" and os.environ.get("SWG_BREAKDOWN"):
    breakdown()
