"""Fused residual-MLP chain as a Pallas TPU kernel.

The NeRF embedding MLP (reference MVResNetMLPNeRFEmbedding,
src/lib/mvnerf/layers.py:334-379) is a chain of 1 input Dense + 2k Dense
layers in pre-activation residual pairs, evaluated over millions of rows
(rays x samples). Under plain XLA each Dense writes its [N, 128] activation
back to HBM; at the flagship scale that inter-layer traffic is on par with the
MXU compute itself. This kernel pins ALL weights in VMEM, streams row tiles of
the input, and keeps the hidden stream in VMEM across every layer — one HBM
read of the input and one write of the output per row.

Interface mirrors the flax modules so the renderer can swap it in behind a
flag (tcnerf.models.renderer use_pallas):
  resmlp_chain(x, params, n_blocks, readout=None) with params from
  nn.mlp.MVResNetMLPEmbedding / nn.blocks.RenderReadout param trees.

Differentiability: `resmlp_rows` is the raw forward kernel;
`resmlp_rows_diff` wraps it in a jax.custom_vjp whose backward rematerializes
the chain with the jnp reference implementation and backpropagates through it
(one extra forward of XLA matmuls — the classic remat trade). Training can
therefore run the fused kernel on the forward pass (nn/mlp.py use_pallas);
grad parity vs the pure-jnp path is tested in tests/test_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def chain_math(hs, weights, idx, n_blocks: int, readout: bool,
               activation: str, fast: bool):
    """The residual-block chain on a list of row-tile values.

    hs: list of [rows, hidden] arrays (independent sub-tiles, interleaved in
    program order so Mosaic can overlap one tile's VPU with another's MXU);
    weights: sequence of refs/arrays starting at `idx` laid out as
    [wA_i, bA_i, wB_i, bB_i] * n_blocks then optionally (w_r, b_r).
    fast=True keeps the stream in the weight dtype between layers (serving);
    otherwise the stream accumulates in f32 (training/parity path).
    Returns the list of per-tile outputs.
    """
    act = jax.nn.relu if activation == "relu" else jax.nn.elu

    def mm(r, w, b):
        # Mosaic requires a 32-bit matmul accumulator; in fast mode the
        # stream drops back to the weight dtype right after the bias.
        out = jnp.dot(r.astype(w.dtype), w,
                      preferred_element_type=jnp.float32) + b
        return out.astype(w.dtype) if fast else out

    for _ in range(n_blocks):
        wa, ba = weights[idx][:], weights[idx + 1][:]
        wb, bb = weights[idx + 2][:], weights[idx + 3][:]
        idx += 4
        r1 = [act(h) for h in hs]
        r2 = [mm(r, wa, ba) for r in r1]
        r3 = [act(r) for r in r2]
        r4 = [mm(r, wb, bb) for r in r3]
        hs = [h + r for h, r in zip(hs, r4)]

    if readout:
        wr, br = weights[idx][:], weights[idx + 1][:]
        return [mm(jax.nn.relu(h), wr, br) for h in hs]
    return hs


def _chain_kernel(n_blocks: int, readout: bool, activation: str,
                  skip_input: bool, fast: bool, nsplit: int, x_ref, *refs):
    """refs layout: [w0, b0 unless skip_input], [wA_i, bA_i, wB_i, bB_i] *
    n_blocks, (readout_w, readout_b)?, out_ref (last). skip_input=True means
    x already IS the hidden stream (layer_0 applied outside — e.g. the
    corner-gather path folds its feature slice into the image and adds the
    pos/dir head before the kernel).

    fast=True keeps the hidden stream in the weight dtype (bf16): the chain is
    VPU-bound, not MXU-bound — an f32 stream costs ~3.5 VPU passes/layer
    (astype + bias + act + residual) vs the MXU's ~1 pass-equivalent, so the
    dtype round-trips dominate. nsplit>1 runs that many independent sub-tile
    chains interleaved in program order so Mosaic can overlap one chain's VPU
    activation with another's MXU matmul (serving path; training keeps the f32
    stream for grad parity)."""
    out_ref = refs[-1]
    weights = refs[:-1]
    tile = x_ref.shape[0]
    sub = tile // nsplit
    rows = [pl.ds(k * sub, sub) for k in range(nsplit)]

    if skip_input:
        idx = 0
        hs = [x_ref[rk, :] if fast else x_ref[rk, :].astype(jnp.float32)
              for rk in rows]
    else:
        w0 = weights[0][:]
        b0 = weights[1][:]
        idx = 2

        def mm0(r):
            out = jnp.dot(r.astype(w0.dtype), w0,
                          preferred_element_type=jnp.float32) + b0
            return out.astype(w0.dtype) if fast else out

        hs = [mm0(x_ref[rk, :]) for rk in rows]

    outs = chain_math(hs, weights, idx, n_blocks, readout, activation, fast)
    for rk, o in zip(rows, outs):
        out_ref[rk, :] = o.astype(out_ref.dtype)


def _flatten_params(mlp_params, n_blocks: int, prefix: str,
                    readout_params=None):
    flat = [mlp_params["layer_0"]["kernel"], mlp_params["layer_0"]["bias"]]
    for i in range(n_blocks):
        block = mlp_params[f"{prefix}_{i}"]
        flat += [block["layer_0"]["kernel"], block["layer_0"]["bias"],
                 block["layer_1"]["kernel"], block["layer_1"]["bias"]]
    if readout_params is not None:
        flat += [readout_params["output_layer"]["kernel"],
                 readout_params["output_layer"]["bias"]]
    return flat


@functools.partial(jax.jit, static_argnames=("n_blocks", "readout",
                                             "activation", "tile",
                                             "interpret", "skip_input",
                                             "fast", "nsplit"))
def resmlp_rows(x, flat_weights: Tuple, n_blocks: int, readout: bool = False,
                activation: str = "relu", tile: int = 512,
                interpret: bool = False, skip_input: bool = False,
                fast: bool = False, nsplit: int = 1):
    """Run the fused chain over rows. x: [N, D_in] -> [N, H] or [N, out].
    skip_input=True: x is already the hidden stream; flat_weights then holds
    only the block (and optional readout) weights. fast/nsplit: see
    _chain_kernel (bf16 stream + interleaved sub-tile chains; serving only)."""
    n, d_in = x.shape
    out_dim = (flat_weights[-2].shape[1] if readout
               else (d_in if skip_input else flat_weights[0].shape[1]))

    n_pad = _round_up(max(n, tile), tile)
    if n_pad != n:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad - n, d_in), x.dtype)], axis=0)

    grid = (n_pad // tile,)
    in_specs = [pl.BlockSpec((tile, d_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    # weights: full arrays resident in VMEM for every tile
    for wgt in flat_weights:
        if wgt.ndim == 1:
            in_specs.append(pl.BlockSpec(
                (wgt.shape[0],), lambda i: (0,), memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(
                wgt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    kernel = functools.partial(_chain_kernel, n_blocks, readout, activation,
                               skip_input, fast, nsplit)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_dim), x.dtype),
        interpret=interpret,
    )(x, *flat_weights)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def resmlp_rows_diff(x, flat_weights: Tuple, n_blocks: int,
                     readout: bool = False, activation: str = "relu",
                     tile: int = 512, skip_input: bool = False,
                     interpret: bool = False):
    """Differentiable wrapper: Pallas forward, remat-jnp backward.

    Same signature/semantics as `resmlp_rows`. All args after flat_weights
    are nondiff and must be passed POSITIONALLY (custom_vjp restriction);
    flat_weights MUST be a tuple (custom_vjp flattens the diff args)."""
    return resmlp_rows(x, flat_weights, n_blocks, readout=readout,
                       activation=activation, tile=tile,
                       skip_input=skip_input, interpret=interpret)


def _resmlp_diff_fwd(x, flat_weights, n_blocks, readout, activation, tile,
                     skip_input, interpret):
    out = resmlp_rows(x, flat_weights, n_blocks, readout=readout,
                      activation=activation, tile=tile, skip_input=skip_input,
                      interpret=interpret)
    return out, (x, flat_weights)


def _resmlp_diff_bwd(n_blocks, readout, activation, tile, skip_input,
                     interpret, residuals, g):
    x, flat_weights = residuals

    def ref(x_, weights_):
        return resmlp_reference(x_, weights_, n_blocks, readout=readout,
                                activation=activation, skip_input=skip_input)

    _, vjp = jax.vjp(ref, x, flat_weights)
    dx, dw = vjp(g.astype(x.dtype) if g.dtype != x.dtype else g)
    return dx, dw


resmlp_rows_diff.defvjp(_resmlp_diff_fwd, _resmlp_diff_bwd)


def resmlp_reference(x, flat_weights, n_blocks: int, readout: bool = False,
                     activation: str = "relu", skip_input: bool = False):
    """jnp oracle with identical math (for parity tests and the VJP)."""
    act = jax.nn.relu if activation == "relu" else jax.nn.elu
    if skip_input:
        h = x
        idx = 0
    else:
        h = x @ flat_weights[0] + flat_weights[1]
        idx = 2
    for _ in range(n_blocks):
        wa, ba, wb, bb = flat_weights[idx:idx + 4]
        idx += 4
        r = act(h)
        r = r @ wa + ba
        r = act(r)
        r = r @ wb + bb
        h = h + r
    if readout:
        wr, br = flat_weights[idx], flat_weights[idx + 1]
        return jax.nn.relu(h) @ wr + br
    return h
