"""Small per-ray sorts as rank + one-hot permutation matmuls.

TPU's variadic sort is slow for the renderer's tiny per-ray sorts
(jnp.sort of 128 z-values per ray measured ~20 ms per 4096-ray chunk,
tools/bench_stages.py). For fixed tiny N the rank of each element is one
vectorized compare-sum on the VPU, and applying the permutation is one
[N, N] one-hot matmul on the MXU — both fast, no data-dependent control flow.

`sort_small(v)` is a drop-in jnp.sort for the last axis (stable).
`merge_sorted(a, b)` merges two sorted arrays along the last axis without
re-ranking across the full union (2 cross compare-sums instead of N^2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _apply_permutation(values: jnp.ndarray, ranks: jnp.ndarray) -> jnp.ndarray:
    """Place values[..., i] at position ranks[..., i] via one-hot matmul."""
    n = values.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    onehot = (ranks[..., :, None] == iota).astype(values.dtype)  # [..., N, N]
    return jnp.einsum("...ij,...i->...j", onehot, values,
                      precision=jax.lax.Precision.HIGHEST)


def sort_small(values: jnp.ndarray) -> jnp.ndarray:
    """Stable ascending sort of the last axis (intended for N <= ~256)."""
    n = values.shape[-1]
    vi = values[..., :, None]
    vj = values[..., None, :]
    less = (vj < vi).astype(jnp.int32)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ties = ((vj == vi) & (iota_j < iota_i)).astype(jnp.int32)
    ranks = jnp.sum(less + ties, axis=-1)
    return _apply_permutation(values, ranks)


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two ascending-sorted arrays along the last axis -> sorted union.

    rank(a_i) = i + #(b < a_i); rank(b_j) = j + #(a <= b_j) — ties place all
    of `a` first (stable merge).
    """
    na, nb = a.shape[-1], b.shape[-1]
    count_b_lt_a = jnp.sum((b[..., None, :] < a[..., :, None]).astype(jnp.int32),
                           axis=-1)
    count_a_le_b = jnp.sum((a[..., None, :] <= b[..., :, None]).astype(jnp.int32),
                           axis=-1)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (na,), 0)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (nb,), 0)
    ranks = jnp.concatenate([iota_a + count_b_lt_a, iota_b + count_a_le_b],
                            axis=-1)
    return _apply_permutation(jnp.concatenate([a, b], axis=-1), ranks)
