"""Microbenchmark: scattered row-gather strategies on TPU.

The dominant serving cost (docs/perf_notes.md) is the bilinear corner-row
gather: ~11 ns/row fixed + bytes/~115 GB/s, nearly independent of how the
rows are fetched through XLA. This probes whether Pallas can beat it:

  A. XLA take_along_axis            (the current render-path gather)
  A2. XLA, indices sorted           (does XLA exploit locality?)
  B. Pallas per-row DMA from HBM    (double-buffered async copies)
  C. Pallas fori_loop VMEM reads    (patch resident in VMEM)
  D. Pallas jnp.take from VMEM      (Mosaic dynamic-gather lowering)

Run on the real chip: python tools/bench_gather2.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 480, 640, 512          # corner-image rows: 4 x 128 bf16 = 1 KB
N = 512 * 1024                   # queries (fine stage of one 4096-ray chunk)
TILE = 512


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(jnp.sum(out[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    return dt


# ---------------------------------------------------------------- A: XLA
@jax.jit
def xla_gather(img_flat, idx):
    return jnp.take_along_axis(img_flat, idx[:, None], axis=0)


# ------------------------------------------------- B: Pallas per-row DMA
def _dma_kernel(idx_ref, img_ref, out_ref, sem):
    def issue(q, _):
        pltpu.make_async_copy(img_ref.at[idx_ref[q]], out_ref.at[q],
                              sem.at[q % 128]).start()
        return _
    def wait(q, _):
        pltpu.make_async_copy(img_ref.at[idx_ref[q]], out_ref.at[q],
                              sem.at[q % 128]).wait()
        return _
    # issue in waves of 128 so semaphores are not reused while in flight
    def wave(w, _):
        jax.lax.fori_loop(w * 128, (w + 1) * 128, issue, None)
        jax.lax.fori_loop(w * 128, (w + 1) * 128, wait, None)
        return _
    jax.lax.fori_loop(0, TILE // 128, wave, None)


@jax.jit
def pallas_dma_gather(img_flat, idx):
    n = idx.shape[0]
    grid = (n // TILE,)
    return pl.pallas_call(
        _dma_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((128,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n, C), img_flat.dtype),
    )(idx, img_flat)


# --------------------------------------- C: fori_loop VMEM dynamic reads
PATCH = 2048


def _vmem_loop_kernel(idx_ref, patch_ref, out_ref):
    def body(q, _):
        out_ref[q, :] = patch_ref[idx_ref[q], :]
        return _
    jax.lax.fori_loop(0, TILE, body, None)


@jax.jit
def pallas_vmem_loop(patch, idx):
    n = idx.shape[0]
    grid = (n // TILE,)
    return pl.pallas_call(
        _vmem_loop_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((PATCH, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, C), patch.dtype),
    )(idx, patch)


# ------------------------------------------------ D: jnp.take from VMEM
def _vmem_take_kernel(idx_ref, patch_ref, out_ref):
    out_ref[:] = jnp.take(patch_ref[:], idx_ref[:], axis=0)


@jax.jit
def pallas_vmem_take(patch, idx):
    n = idx.shape[0]
    grid = (n // TILE,)
    return pl.pallas_call(
        _vmem_take_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((PATCH, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, C), patch.dtype),
    )(idx, patch)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H * W, C)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, H * W, size=N), jnp.int32)
    idx_sorted = jnp.sort(idx)
    idx_small = jnp.asarray(rng.integers(0, PATCH, size=N), jnp.int32)
    patch = img[:PATCH]

    results = {}
    dt = timeit(xla_gather, img, idx)
    results["A  xla take_along_axis"] = dt
    dt = timeit(xla_gather, img, idx_sorted)
    results["A2 xla sorted idx"] = dt
    for name, fn, a, b in [
            ("B  pallas per-row DMA", pallas_dma_gather, img, idx),
            ("C  pallas vmem fori", pallas_vmem_loop, patch, idx_small),
            ("D  pallas vmem take", pallas_vmem_take, patch, idx_small)]:
        try:
            dt = timeit(fn, a, b)
            results[name] = dt
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {str(e)[:200]}"

    for k, v in results.items():
        if isinstance(v, float):
            print(f"{k:28s} {v*1e3:8.2f} ms   {v/N*1e9:6.2f} ns/row")
        else:
            print(f"{k:28s} {v}")


if __name__ == "__main__":
    main()
