"""Microbenchmark round 2: the primitives a sorted-window fused gather needs.

The serving bottleneck is the scattered corner-row gather (~28 ns/row XLA on
this chip). The candidate redesign: sort queries by pixel row, DMA contiguous
row-windows into VMEM (scalar-prefetch dynamic index_map), gather in-VMEM,
run the MLP in sorted order, and composite after a cheap un-permute. This
bench measures every primitive that plan depends on:

  S1  jnp.sort          int32 keys, N=786k
  S2  jax.lax.sort      key + 16B payload (4 x f32 ops)
  S3  jnp.argsort       int32 keys
  G1  XLA gather        [N, 4] f32  (narrow rows: is ns/row width-dependent?)
  G2  XLA gather        [N, 128] bf16
  P1  pallas row loop   out[q] = win[idx[q]] from a VMEM window, unrolled x8
  P2  pallas take_along_axis  lane gather, matching [512,128] shapes
  P3  pallas one-hot MXU gather  window 512 rows, C=128

Run on the real chip: python tools/bench_gather3.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 786_432          # queries per render chunk (4096 rays x 192 samples)
HW = 480 * 640


def timeit(fn, *args, iters=5):
    out = fn(*args)
    out0 = out[0] if isinstance(out, (tuple, list)) else out
    _ = float(jnp.sum(out0[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out0 = out[0] if isinstance(out, (tuple, list)) else out
    _ = float(jnp.sum(out0[:8].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


@jax.jit
def sort_keys(k):
    return jnp.sort(k)


@jax.jit
def sort_payload(k, p0, p1, p2, p3):
    return jax.lax.sort((k, p0, p1, p2, p3), num_keys=1)


@jax.jit
def argsort_keys(k):
    return jnp.argsort(k)


@jax.jit
def xla_gather(tbl, idx):
    return jnp.take_along_axis(tbl, idx[:, None], axis=0)


# ---- P1: per-row dynamic-slice loop over a VMEM-resident window ----
TILE = 512
WIN = 2048


def _row_loop_kernel(idx_ref, win_ref, out_ref):
    def body(i, _):
        for u in range(8):
            q = i * 8 + u
            out_ref[q, :] = win_ref[idx_ref[q], :]
        return _
    jax.lax.fori_loop(0, TILE // 8, body, None)


@jax.jit
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


def _row_loop_kernel_blk(idx_ref, win_ref, out_ref):
    base = pl.program_id(0) * TILE

    def body(i, _):
        for u in range(8):
            q = i * 8 + u
            out_ref[q, :] = win_ref[idx_ref[base + q], :]
        return _
    jax.lax.fori_loop(0, TILE // 8, body, None)


# ---- P2: lane gather via take_along_axis with matching shapes ----
def _lane_gather_kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)


@jax.jit
def pallas_lane_gather(src, idx):
    n = src.shape[0]
    return pl.pallas_call(
        _lane_gather_kernel,
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


# ---- P3: windowed one-hot MXU gather ----
OH_WIN = 512


def _onehot_kernel(idx_ref, win_ref, out_ref):
    base = pl.program_id(0) * TILE
    ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, OH_WIN), 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (TILE, OH_WIN), 0)
    sel = jnp.zeros((TILE, 1), jnp.int32)

    def body(i, sel):
        return sel.at[i, 0].set(idx_ref[base + i])
    # build select vector from SMEM scalars (vectorized via iota compare below
    # needs idx as a vector; SMEM scalars are read one by one — emulate with a
    # VMEM pass instead, see caller which passes idx as VMEM too)
    del q, body
    onehot = (ids == idx_ref[base]).astype(win_ref.dtype)  # placeholder
    out_ref[:] = jnp.dot(onehot, win_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _onehot_kernel_v(idxv_ref, win_ref, out_ref):
    ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, OH_WIN), 1)
    onehot = (ids == idxv_ref[:]).astype(win_ref.dtype)
    out_ref[:] = jnp.dot(onehot, win_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


@jax.jit
def pallas_onehot(win, idxv):
    n = idxv.shape[0]
    return pl.pallas_call(
        _onehot_kernel_v,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OH_WIN, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), win.dtype),
    )(idxv, win)


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, HW, size=N), jnp.int32)
    pay = [jnp.asarray(rng.normal(size=N), jnp.float32) for _ in range(4)]
    tbl4 = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    tbl128 = jnp.asarray(rng.normal(size=(HW, 128)), jnp.bfloat16)
    idx_n = jnp.asarray(rng.integers(0, N, size=N), jnp.int32)
    idx_hw = jnp.asarray(rng.integers(0, HW, size=N), jnp.int32)
    win = jnp.asarray(rng.normal(size=(WIN, 128)), jnp.float32)
    win_bf = win.astype(jnp.bfloat16)
    idx_win = jnp.asarray(rng.integers(0, WIN, size=N), jnp.int32)
    src = jnp.asarray(rng.normal(size=(N, 128)), jnp.bfloat16)
    idx_lane = jnp.asarray(rng.integers(0, 128, size=(N, 128)), jnp.int32)
    idx_oh = jnp.asarray(rng.integers(0, OH_WIN, size=(N, 1)), jnp.int32)

    tests = [
        ("S1 jnp.sort 786k i32", sort_keys, (keys,), N),
        ("S2 lax.sort +16B payload", sort_payload, (keys, *pay), N),
        ("S3 jnp.argsort 786k", argsort_keys, (keys,), N),
        ("G1 xla gather [N,4]f32", xla_gather, (tbl4, idx_n), N),
        ("G2 xla gather [N,128]bf16", xla_gather, (tbl128, idx_hw), N),
        ("P1 vmem row loop x8", pallas_row_loop, (win, idx_win), N),
        ("P1b vmem row loop bf16", pallas_row_loop, (win_bf, idx_win), N),
        ("P2 lane take_along_axis", pallas_lane_gather, (src, idx_lane), N),
        ("P3 one-hot MXU win=512", pallas_onehot, (win_bf[:OH_WIN], idx_oh), N),
    ]
    for name, fn, args, n in tests:
        try:
            dt = timeit(fn, *args)
            print(f"{name:28s} {dt*1e3:8.2f} ms   {dt/n*1e9:6.2f} ns/row")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{name:28s} FAIL: {msg}")


if __name__ == "__main__":
    main()
