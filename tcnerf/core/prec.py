"""Precision-pinned linear algebra helpers.

JAX lowers `jnp.einsum`/`dot` to MXU matmuls at the *default* precision, which
on TPU (and on this stack even for CPU lowering) can be bf16 — fine for neural
layers, catastrophic for camera geometry: a 2.5e-3 relative error on a 640-px
projection is a multi-pixel gather offset. All geometry einsums therefore pin
Precision.HIGHEST; neural matmuls elsewhere keep the fast default.
"""

import functools

import jax
import jax.numpy as jnp

heinsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
