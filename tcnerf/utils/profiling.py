"""Tracing/profiling utilities (aux subsystem; the reference has none beyond
wall-clock timing of pose optimization, SURVEY.md §5).

`trace(logdir)` captures a jax.profiler trace viewable in TensorBoard/Perfetto;
`benchmark(fn, *args)` measures steady-state device time with proper warmup and
block_until_ready semantics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 2,
              **kwargs) -> float:
    """Average wall seconds per call of a jitted fn (device-synchronized)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def timed(label: str, sink=None):
    """Wall-clock scope timer; logs via tcnerf.utils.logging by default."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is None:
        from .logging import logger
        logger.info(f"{label}: {dt * 1000:.2f} ms")
    else:
        sink(label, dt)
