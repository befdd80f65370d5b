"""Microbenchmark round 3: scan-amortized primitive costs on the real chip.

bench_gather2/3 timings were polluted by a large fixed dispatch overhead
through the axon tunnel (G1 [N,4] == G2 [N,128] is impossible for a
bandwidth-bound op). Here every op runs K times inside one jitted
lax.fori_loop with a data dependence, so the per-iteration cost is the real
device-side marginal cost.

Run on the real chip: python tools/bench_gather4.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 786_432
HW = 480 * 640
K = 16          # inner iterations
TILE = 512
WIN = 2048


def amortized(op, n_iters=K):
    """Wrap op(x, i) -> x-like into a K-iteration fori loop, jitted."""

    @jax.jit
    def run(*args):
        def body(i, carry):
            return op(carry, i, *args[1:])
        return jax.lax.fori_loop(0, n_iters, body, args[0])

    return run


def timeit(fn, *args, outer=3):
    out = fn(*args)
    _ = float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(outer):
        out = fn(*args)
    _ = float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
    return (time.perf_counter() - t0) / outer / K


# ---------------- XLA ops ----------------
def op_sort(keys, i):
    return jnp.sort(keys + i)


def op_argsort(keys, i):
    return jnp.argsort(keys + i).astype(jnp.int32)


def op_sort_payload(keys, i, p0, p1, p2, p3):
    out = jax.lax.sort((keys + i, p0, p1, p2, p3), num_keys=1)
    return out[0]


def op_gather_narrow(idx, i, tbl):
    out = jnp.take_along_axis(tbl, ((idx + i) % N)[:, None], axis=0)
    return idx + out[:, 0].astype(jnp.int32)


def op_gather_wide(idx, i, tbl):
    out = jnp.take_along_axis(tbl, ((idx + i) % HW)[:, None], axis=0)
    return idx + out[:, 0].astype(jnp.int32)


def op_noop(x, i):
    return x + i


# ---------------- Pallas variants ----------------
def _row_loop_kernel(idx_ref, win_ref, out_ref):
    def body(i, _):
        for u in range(8):
            q = i * 8 + u
            out_ref[pl.ds(q, 1), :] = win_ref[pl.ds(idx_ref[q], 1), :]
        return _
    jax.lax.fori_loop(0, TILE // 8, body, None, unroll=True)


def pallas_row_loop(win, idx):
    n = idx.shape[0]
    return pl.pallas_call(
        _row_loop_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // TILE,),
            in_specs=[pl.BlockSpec((WIN, 128), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, 128), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, 128), win.dtype),
    )(idx, win)


def op_pallas_row_loop(idx, i, win):
    out = pallas_row_loop(win, (idx + i) % WIN)
    return idx + out[:, 0].astype(jnp.int32)


def _lane_kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)


def pallas_lane(src, idx):
    n = src.shape[0]
    return pl.pallas_call(
        _lane_kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), src.dtype),
    )(src, idx)


def op_pallas_lane(idx, i, src):
    out = pallas_lane(src, (idx + i) % 128)
    return idx + out[:, :1].astype(jnp.int32)


def _lane_f32_kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)


def pallas_lane_f32(src, idx):
    n = src.shape[0]
    return pl.pallas_call(
        _lane_f32_kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), src.dtype),
    )(src, idx)


def op_pallas_lane_f32(idx, i, src):
    out = pallas_lane_f32(src, (idx + i) % 128)
    return idx + out[:, :1].astype(jnp.int32)


def _onehot_kernel(idxv_ref, win_ref, out_ref):
    ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, WIN), 1)
    onehot = (ids == idxv_ref[:]).astype(win_ref.dtype)
    out_ref[:] = jnp.dot(onehot, win_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def pallas_onehot(win, idxv):
    n = idxv.shape[0]
    return pl.pallas_call(
        _onehot_kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIN, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), win.dtype),
    )(idxv, win)


def op_pallas_onehot(idx, i, win):
    out = pallas_onehot(win, ((idx + i) % WIN)[:, None])
    return idx + out[:, 0].astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, HW, size=N), jnp.int32)
    pay = [jnp.asarray(rng.normal(size=N), jnp.float32) for _ in range(4)]
    tbl4 = jnp.asarray(rng.normal(size=(N, 4)), jnp.bfloat16)
    tbl128 = jnp.asarray(rng.normal(size=(HW, 128)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, size=N), jnp.int32)
    win = jnp.asarray(rng.normal(size=(WIN, 128)), jnp.bfloat16)
    src = jnp.asarray(rng.normal(size=(N, 128)), jnp.bfloat16)
    srcf = src.astype(jnp.float32)
    idxl = jnp.asarray(rng.integers(0, 128, size=(N, 128)), jnp.int32)

    tests = [
        ("Z  noop x+i", amortized(op_noop), (keys,), N),
        ("S1 jnp.sort", amortized(op_sort), (keys,), N),
        ("S3 jnp.argsort", amortized(op_argsort), (keys,), N),
        ("S2 sort +16B payload", amortized(op_sort_payload),
         (keys, *pay), N),
        ("G1 gather [N,4]bf16", amortized(op_gather_narrow), (idx, tbl4), N),
        ("G2 gather [N,128]bf16", amortized(op_gather_wide),
         (idx, tbl128), N),
        ("P1 vmem row loop", amortized(op_pallas_row_loop), (idx, win), N),
        ("P2 lane TAA bf16", amortized(op_pallas_lane), (idxl[:, :], src), N),
        ("P2f lane TAA f32", amortized(op_pallas_lane_f32),
         (idxl[:, :], srcf), N),
        ("P3 one-hot MXU win2048", amortized(op_pallas_onehot), (idx, win), N),
    ]
    for name, fn, args, n in tests:
        try:
            dt = timeit(fn, *args)
            print(f"{name:26s} {dt*1e3:8.3f} ms   {dt/n*1e9:7.3f} ns/row")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:150]
            print(f"{name:26s} FAIL: {msg}")


if __name__ == "__main__":
    main()
