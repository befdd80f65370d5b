"""Sorted-window gather fused with the residual-MLP chain (one Pallas kernel).

The serving bottleneck is the scattered bilinear feature gather: XLA's TPU row
gather costs ~12 ns/row regardless of layout (tools/bench_gather4.py), which
at 786k rows/chunk (4096 rays x 192 samples, reference workload
src/lib/mvnerf/model_v0.py:102-184) is ~10 ms — more than the MLP compute it
feeds. This kernel restructures the gather around three measured facts:

  * XLA's TPU sort is cheap (~1.5 ms for 786k keys + 16 B payload);
  * a windowed one-hot matmul gather rides the MXU at >200 TF/s — and the
    one-hot weights can BE the bilinear lerp weights (a triangle kernel
    `relu(1 - |ids - (x0 + ax)|)` places exactly (1-ax, ax) on the two
    x-corners);
  * Pallas BlockSpec index_maps driven by scalar prefetch give each grid step
    a dynamically-offset contiguous window of the image at 128-row
    granularity.

Pipeline: sort queries by corner pixel index (payload: position/direction/
lerp fractions) -> per 512-query block, DMA two [KA*128, 128] row-windows
(the y0 and y0+1 image rows live exactly W'/128 groups apart) -> build the
two weighted one-hots -> two MXU matmuls gather AND lerp -> add the
positional/direction head -> run the full residual chain + readout in VMEM
-> un-permute the 4-wide outputs with a second cheap sort.

Two kernel variants: the row-major `_swg_kernel` (geometry head computed
outside; used for the f32 parity path) and the serving default
`_swg_kernel_t` — fully transposed [channels, queries] layout with the
geometry head fused inside (in-kernel double-angle sin/cos on [6, BQ] rows
uses full lanes; encodings never touch HBM; VPU transcendentals overlap the
MXU chain). Fine-stage cost at 524k queries: 34.5 ms (XLA 4-tap gather +
Pallas chain) -> 8.8 ms (docs/perf_notes.md round 2).

The image must be pre-projected to the MLP hidden width
(MVResNetMLPEmbedding.project_image / SliceableDense.project_tail) and padded
so its width is a multiple of 128. Overflow (a block whose sorted keys span
more than the window) is detected OUTSIDE the kernel from the per-block spans
so the caller can lax.cond to the exact XLA fallback (models/fused.py).

1-view serving path (the flagship bench configuration); the general
multi-view/training path stays on models/renderer.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resmlp import chain_math

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _swg_kernel(n_blocks: int, readout: bool, activation: str, ka: int,
                fast: bool, nsplit: int,
                s_ref, keys_ref, frac_ref, g_ref, *refs):
    """refs: [imgA_0..imgA_{ka-1}, imgB_0..imgB_{ka-1}, chain weights..., out].

    Per block: window A holds image rows (groups s..s+ka) covering the y0
    corners, window B the same shifted by W'/128 groups (the y0+1 corners).
    The triangle one-hot gathers + lerps both x-corners per window in one
    matmul; ay lerps across the two windows.
    """
    out_ref = refs[-1]
    imgA = refs[:ka]
    imgB = refs[ka:2 * ka]
    weights = refs[2 * ka:-1]

    i = pl.program_id(0)
    bq = keys_ref.shape[0]
    win = ka * LANE

    base = s_ref[i] * LANE
    l_i = keys_ref[:, 0:1] - base                       # [BQ, 1] int32
    ax = frac_ref[:, 0:1]                               # [BQ, 1] f32
    ay = frac_ref[:, 1:2]
    ids = jax.lax.broadcasted_iota(jnp.int32, (bq, win), 1).astype(jnp.float32)
    center = l_i.astype(jnp.float32) + ax
    # (1-ax)@l, ax@l+1; the ay-lerp runs on the [BQ, 128] matmul outputs
    # (see _swg_kernel_t) — one shared triangle feeds both window matmuls
    tri = jnp.maximum(0.0, 1.0 - jnp.abs(ids - center)).astype(imgA[0].dtype)

    winA = jnp.concatenate([r[0] for r in imgA], axis=0)  # [win, 128]
    winB = jnp.concatenate([r[0] for r in imgB], axis=0)
    gA = jnp.dot(tri, winA, preferred_element_type=jnp.float32)
    gB = jnp.dot(tri, winB, preferred_element_type=jnp.float32)
    h0 = gA + (gB - gA) * ay + g_ref[:].astype(jnp.float32)

    sub = bq // nsplit
    # slice h0 into sub-tiles (h0 is a value, not a ref -> static lax slices)
    hs = [jax.lax.slice_in_dim(h0, k * sub, (k + 1) * sub, axis=0)
          for k in range(nsplit)]
    hs = [h.astype(weights[0].dtype) if fast else h for h in hs]

    outs = chain_math(hs, weights, 0, n_blocks, readout, activation, fast)
    for k, o in enumerate(outs):
        out_ref[pl.ds(k * sub, sub), :] = o.astype(out_ref.dtype)


def _chain_math_t(h, weights, idx, n_blocks: int, readout: bool,
                  activation: str, msplit: int = 1):
    """Transposed residual chain: h is [hidden, BQ]; weights are the
    PRE-TRANSPOSED kernels W^T [out, in] with biases reshaped [out, 1].

    msplit > 1 splits the query columns into independent slices and
    interleaves their layer ops: a K=N=128 serial chain leaves the MXU
    ~1/3 idle on pipeline fill between dependent matmuls; back-to-back
    INDEPENDENT matmuls on the slices let the scheduler hide the fill."""
    act = jax.nn.relu if activation == "relu" else jax.nn.elu

    def mm(r, wt, b):
        out = jnp.dot(wt[:], r, preferred_element_type=jnp.float32) + b[:]
        return out.astype(wt.dtype)

    bqs = h.shape[1] // msplit
    hs = [jax.lax.slice_in_dim(h, k * bqs, (k + 1) * bqs, axis=1)
          for k in range(msplit)]
    for _ in range(n_blocks):
        wa, ba = weights[idx], weights[idx + 1]
        wb, bb = weights[idx + 2], weights[idx + 3]
        idx += 4
        rs = [act(x) for x in hs]
        rs = [mm(r, wa, ba) for r in rs]
        rs = [act(r) for r in rs]
        rs = [mm(r, wb, bb) for r in rs]
        hs = [x + r for x, r in zip(hs, rs)]
    if readout:
        wr, br = weights[idx], weights[idx + 1]
        outs = [mm(jax.nn.relu(x), wr, br) for x in hs]
    else:
        outs = hs
    return outs[0] if msplit == 1 else jnp.concatenate(outs, axis=1)


def _swg_kernel_t(n_blocks: int, readout: bool, activation: str, ka: int,
                  sg: int, n_freq: int, base_freq: float, msplit: int,
                  merged_wg: int, s_ref, pdt_ref, *refs):
    """Fully transposed sorted-window kernel with the geometry head inside.

    Layout is [channels, queries] everywhere: the in-kernel sin/cos runs on
    [6, BQ] (full lanes, vs 3/128 utilization row-major), the gather matmuls
    are winT [hidden, win] @ ohT [win, BQ], and the chain is W^T @ h — same
    MXU rate as row-major (measured), but the encodings are never
    materialized in HBM and the VPU transcendentals can overlap the MXU.

    refs: [head_pad_T, head_bias, then per subgroup j: imgA_j_0..{ka-1},
    imgB_j_0..{ka-1}, then chain W^T/bias pairs..., out (last)]. head_pad_T
    is [hidden, 128] with column j holding head-kernel row perm(j) and zero
    columns past the encoding width (so uninitialized scratch rows cannot
    leak through).
    pdt: [8, BQ] f32 = (pos xyz, dir xyz, packed 11-bit ax/ay pair, keys)
    sorted — the keys ride as exact f32 (< 2^24) because Mosaic block
    sublane dims must be multiples of 8.

    sg>1 splits the BQ queries into sg subgroups, each with its OWN window
    base (scalar-prefetch entry i*sg+j): sparse key regions need wide
    per-128-query windows while the residual chain still runs on the full
    [hidden, BQ] tile — decoupling gather capacity from MXU tile size.
    """
    out_ref = refs[-1]
    head_t = refs[0]
    head_b = refs[1]
    # merged_wg > 0: the A (y0) and B (y0+1) windows overlap (ka > w_groups),
    # so each subgroup carries ONE contiguous span of merged_wg + ka group
    # blocks covering both — (ka - w_groups) groups fewer DMA'd per window
    # pair. merged_wg == 0: disjoint per-window A/B blocks (2 * ka each).
    span = (merged_wg + ka) if merged_wg else 2 * ka
    nwin = span * sg
    wins = refs[2:2 + nwin]
    weights = refs[2 + nwin:-1]

    i = pl.program_id(0)

    def body(enc):
        bq = pdt_ref.shape[1]
        win = ka * LANE

        # ---- geometry head: double-angle octaves into scratch [128, BQ]
        x6 = pdt_ref[0:6, :] * jnp.float32(base_freq)
        s = jnp.sin(x6)
        c = jnp.cos(x6)
        enc[pl.ds(0, 6), :] = s
        enc[pl.ds(n_freq * 6, 6), :] = c
        for n in range(1, n_freq):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            enc[pl.ds(n * 6, 6), :] = s
            enc[pl.ds((n_freq + n) * 6, 6), :] = c
        enc[pl.ds(2 * n_freq * 6, LANE - 2 * n_freq * 6), :] = jnp.zeros(
            (LANE - 2 * n_freq * 6, bq), jnp.float32)
        h0_geo = jnp.dot(head_t[:], enc[:].astype(head_t.dtype),
                         preferred_element_type=jnp.float32)

        # ---- triangle one-hot gather (transposed), one window/subgroup.
        # The ay-lerp runs on the [hidden, sub] matmul OUTPUTS, not the
        # [win, sub] one-hots: one shared bf16 triangle feeds both window
        # matmuls, cutting the dominant VPU cost (2 muls + 1 cast on
        # win x sub) to 2 cheap ops on hidden x sub — and the lerp happens
        # in f32 after the MXU, which is slightly MORE accurate than
        # rounding tri*(1-ay) to bf16 before it.
        sub = bq // sg
        dt = wins[0].dtype
        ids = jax.lax.broadcasted_iota(jnp.int32, (win, sub), 0).astype(
            jnp.float32)
        h0_parts = []
        for j in range(sg):
            cols = pl.ds(j * sub, sub)
            base_j = (s_ref[i * sg + j] * LANE).astype(jnp.float32)
            l_f = pdt_ref[7:8, cols] - base_j
            # row 6 packs both 11-bit lerp fractions (see swg_rows)
            axay = pdt_ref[6:7, cols]
            hi = jnp.floor(axay * (1.0 / 2048.0))
            ax = hi * (1.0 / 2048.0)
            ay = (axay - hi * 2048.0) * (1.0 / 2048.0)
            tri = jnp.maximum(0.0, 1.0 - jnp.abs(ids - (l_f + ax))).astype(dt)
            boff = ka if not merged_wg else merged_wg
            winA = jnp.concatenate(
                [wins[j * span + k][0] for k in range(ka)], axis=1)
            winB = jnp.concatenate(
                [wins[j * span + boff + k][0] for k in range(ka)], axis=1)
            gA = jnp.dot(winA, tri, preferred_element_type=jnp.float32)
            gB = jnp.dot(winB, tri, preferred_element_type=jnp.float32)
            h0_parts.append(gA + (gB - gA) * ay)
        h0 = jnp.concatenate(h0_parts, axis=1) + h0_geo + head_b[:]
        h = h0.astype(dt)

        out = _chain_math_t(h, weights, 0, n_blocks, readout, activation,
                            msplit)
        out_ref[:] = out.astype(out_ref.dtype)

    pl.run_scoped(body, enc=pltpu.VMEM((LANE, pdt_ref.shape[1]),
                                       jnp.float32))


@functools.partial(jax.jit, static_argnames=(
    "w_groups", "n_blocks", "n_freq", "base_freq", "readout", "activation",
    "ka", "bq", "sg", "msplit", "interpret"))
def swg_gather_mlp_t(s_blocks, posdir_t, img_grouped_t,
                     head_pad_t, head_bias, flat_weights_t: Tuple,
                     w_groups: int, n_blocks: int, n_freq: int = 10,
                     base_freq: float = float(np.pi), readout: bool = True,
                     activation: str = "relu", ka: int = 4, bq: int = 512,
                     sg: int = 1, msplit: int = 1, interpret: bool = False):
    """Transposed fused kernel over pre-sorted queries.

    posdir_t: [8, N] f32 (pos, dir, packed ax/ay, keys-as-f32);
    img_grouped_t: [G, hidden, 128] (prepare_image_t); head_pad_t:
    [hidden, 128]; flat_weights_t: pre-transposed chain weights
    (W^T [out, in], bias [out, 1]) + readout pair; s_blocks: [N/(bq/sg)]
    per-SUBGROUP window bases (sg windows per bq-query block). Returns
    [out_dim, N].
    """
    n = posdir_t.shape[1]
    assert n % bq == 0
    nb = n // bq
    hidden = img_grouped_t.shape[1]
    out_dim = flat_weights_t[-2].shape[0] if readout else hidden

    in_specs = [
        pl.BlockSpec((8, bq), lambda i, s: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, LANE), lambda i, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, 1), lambda i, s: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # When the A (y0) and B (y0+1) windows overlap (ka > w_groups), one
    # contiguous span of w_groups + ka group blocks covers both — fewer
    # bytes AND fewer DMA descriptors than two disjoint ka-group windows
    # (the coarse stage's wide windows: 17 blocks vs 24 at ka=12, wg=5).
    merged_wg = w_groups if ka > w_groups else 0
    nwin = (merged_wg + ka if merged_wg else 2 * ka) * sg
    for j in range(sg):
        if merged_wg:
            for k in range(merged_wg + ka):               # merged A∪B span
                in_specs.append(pl.BlockSpec(
                    (1, hidden, LANE),
                    lambda i, s, j=j, k=k: (s[i * sg + j] + k, 0, 0),
                    memory_space=pltpu.VMEM))
            continue
        for k in range(ka):                               # A windows (y0)
            in_specs.append(pl.BlockSpec(
                (1, hidden, LANE),
                lambda i, s, j=j, k=k: (s[i * sg + j] + k, 0, 0),
                memory_space=pltpu.VMEM))
        for k in range(ka):                               # B windows (y0+1)
            in_specs.append(pl.BlockSpec(
                (1, hidden, LANE),
                lambda i, s, j=j, k=k: (s[i * sg + j] + w_groups + k, 0, 0),
                memory_space=pltpu.VMEM))
    for wgt in flat_weights_t:
        in_specs.append(pl.BlockSpec(wgt.shape,
                                     (lambda i, s: (0, 0)) if wgt.ndim == 2
                                     else (lambda i, s: (0,)),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_swg_kernel_t, n_blocks, readout, activation,
                               ka, sg, n_freq, base_freq, msplit, merged_wg)
    head_b2 = head_bias.reshape(hidden, 1)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((out_dim, bq), lambda i, s: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((out_dim, n), jnp.float32),
        interpret=interpret,
    )(s_blocks, posdir_t, head_pad_t, head_b2,
      *([img_grouped_t] * nwin), *flat_weights_t)


def head_pad_transposed(head_kernel, dim: int, n_freq: int):
    """[pd, hidden] head kernel -> [hidden, 128] with column j = head row
    perm(j): octave-major (sin octaves then cos octaves), channel minor
    (pos xyz, dir xyz) — matching _swg_kernel_t's scratch layout; columns
    past 2*n_freq*2*dim are zero (they multiply uninitialized scratch)."""
    hidden = head_kernel.shape[1]
    cols = []
    for f in range(2):
        for nq in range(n_freq):
            for ch in range(2 * dim):
                blk = 0 if ch < dim else dim * 2 * n_freq
                dd = ch % dim
                cols.append(blk + dd * 2 * n_freq + nq * 2 + f)
    perm = np.asarray(cols)
    head_t = jnp.transpose(head_kernel[perm])            # [hidden, 120]
    pad = LANE - head_t.shape[1]
    return jnp.concatenate(
        [head_t, jnp.zeros((hidden, pad), head_t.dtype)], axis=1)


def transpose_chain_weights(flat_weights: Tuple):
    """Row-major chain weights -> (W^T [out, in], bias [out, 1]) pairs."""
    out = []
    for w in flat_weights:
        if w.ndim == 2:
            out.append(jnp.transpose(w))
        else:
            out.append(w.reshape(-1, 1))
    return tuple(out)


def prepare_image_t(img_p: jnp.ndarray, ka: int = 4):
    """Like prepare_image but groups transposed to [G, hidden, 128]."""
    grouped, w_pad, w_groups = prepare_image(img_p, ka=ka)
    return jnp.transpose(grouped, (0, 2, 1)), w_pad, w_groups


@functools.partial(jax.jit, static_argnames=(
    "w_groups", "n_blocks", "readout", "activation", "ka", "bq", "fast",
    "nsplit", "interpret"))
def swg_gather_mlp(s_blocks, keys_sorted, frac_sorted, h0_geo_sorted,
                   img_grouped, flat_weights: Tuple, w_groups: int,
                   n_blocks: int, readout: bool = True,
                   activation: str = "relu", ka: int = 4, bq: int = 512,
                   fast: bool = True, nsplit: int = 1,
                   interpret: bool = False):
    """The fused kernel over pre-sorted queries.

    s_blocks: [NB] int32 window base (in 128-row groups) per block;
    keys_sorted: [N, 1] int32 corner row index (y0 * W' + x0, sorted);
    frac_sorted: [N, 2] f32 (ax, ay); h0_geo_sorted: [N, hidden] — the
    pos/dir head output (SliceableDense.apply_head) in sorted order;
    img_grouped: [G, 128, hidden] — the pre-projected image in 128-row
    groups, zero-padded by >= w_groups + ka groups; w_groups = W'/128.
    flat_weights: block (+ readout) weights as in resmlp_rows(skip_input).
    Returns [N, out_dim] in sorted order.
    """
    n = keys_sorted.shape[0]
    assert n % bq == 0, (n, bq)
    nb = n // bq
    hidden = h0_geo_sorted.shape[1]
    out_dim = flat_weights[-2].shape[1] if readout else hidden

    in_specs = [
        pl.BlockSpec((bq, 1), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bq, 2), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bq, hidden), lambda i, s: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for k in range(ka):                                   # A windows (y0)
        in_specs.append(pl.BlockSpec(
            (1, LANE, hidden), lambda i, s, k=k: (s[i] + k, 0, 0),
            memory_space=pltpu.VMEM))
    for k in range(ka):                                   # B windows (y0+1)
        in_specs.append(pl.BlockSpec(
            (1, LANE, hidden),
            lambda i, s, k=k: (s[i] + w_groups + k, 0, 0),
            memory_space=pltpu.VMEM))
    for wgt in flat_weights:
        if wgt.ndim == 1:
            in_specs.append(pl.BlockSpec((wgt.shape[0],), lambda i, s: (0,),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(wgt.shape, lambda i, s: (0, 0),
                                         memory_space=pltpu.VMEM))

    kernel = functools.partial(_swg_kernel, n_blocks, readout, activation,
                               ka, fast, nsplit)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bq, out_dim), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
    )(s_blocks, keys_sorted, frac_sorted, h0_geo_sorted,
      *([img_grouped] * (2 * ka)), *flat_weights)


def fast_encode_head(p, d, head_kernel, head_bias, n_freq: int,
                     base_freq: float, dt,
                     embed_direction_vector: bool = True):
    """Geometry-head output via double-angle-recurrence Fourier octaves and a
    row-permuted head kernel (enc @ W is invariant under a shared row
    permutation, so the reference's (d, n, [sin, cos]) interleave is never
    materialized). Shared by swg_rows' XLA fallback and the grouped path."""
    def octaves(x):
        xb = x * jnp.asarray(base_freq, x.dtype)
        s = jnp.sin(xb)
        c = jnp.cos(xb)
        sins, coss = [s], [c]
        for _ in range(n_freq - 1):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            sins.append(s)
            coss.append(c)
        return sins + coss

    dim = p.shape[-1]
    parts = octaves(p)
    parts += octaves(d) if embed_direction_vector else [d]
    enc = jnp.concatenate([q.astype(dt) for q in parts], axis=-1)
    head = _permuted_head(head_kernel, dim, n_freq,
                          embed_direction_vector).astype(dt)
    return (enc @ head + head_bias.astype(dt)).astype(dt)


def _permuted_head(head_kernel, dim: int, n_freq: int,
                   embed_direction_vector: bool):
    """Reorder head-kernel rows from the reference (d, n, [sin, cos])
    interleave to the fast-encoding concat order ([sin octaves..., cos
    octaves...] per input, d minor)."""
    def block(offset):
        idx = []
        for f in range(2):
            for nq in range(n_freq):
                for dd in range(dim):
                    idx.append(offset + dd * 2 * n_freq + nq * 2 + f)
        return idx

    perm = block(0)
    if embed_direction_vector:
        perm += block(dim * 2 * n_freq)
    else:
        base = dim * 2 * n_freq
        perm += list(range(base, base + dim))
    return head_kernel[np.asarray(perm)]


def prepare_image(img_p: jnp.ndarray, ka: int = 4):
    """[H, W, hidden] pre-projected image -> (img_grouped, w_padded, w_groups).

    Pads width to a multiple of 128 and appends w_groups + ka zero row-groups
    so every dynamic window is in bounds.
    """
    h, w, c = img_p.shape
    w_pad = _round_up(w, LANE)
    if w_pad != w:
        img_p = jnp.pad(img_p, ((0, 0), (0, w_pad - w), (0, 0)))
    w_groups = w_pad // LANE
    flat = img_p.reshape(h * w_pad, c)
    n_groups = h * w_pad // LANE
    grouped = flat.reshape(n_groups, LANE, c)
    # pad for the largest window any caller may request (ka is a per-call
    # knob; padding for max(ka, 16) keeps the image valid for all of them)
    pad_groups = w_groups + max(ka, 16)
    grouped = jnp.concatenate(
        [grouped, jnp.zeros((pad_groups, LANE, c), grouped.dtype)], axis=0)
    return grouped, w_pad, w_groups


def swg_rows(img_grouped, w_pad: int, w_groups: int, w_real: int, h_real: int,
             coords_xy, positions, directions, head_kernel, head_bias,
             flat_weights: Tuple, n_blocks: int, n_freq: int = 10,
             pos_encoding_freq: float = float(np.pi),
             embed_direction_vector: bool = True, ka: int = 4, bq: int = 512,
             sg: int = 1, msplit: int = 1, patch_cap: int = 8192,
             fast: bool = True,
             nsplit: int = 1, fast_encoding: bool = True,
             img_grouped_t=None, head_pad_t=None, flat_t=None,
             interpret: bool = False):
    """Full sorted-window pipeline over flat queries (1 view, 1 batch).

    coords_xy: [N, 2] continuous pixel coords (x, y) into the REAL image
    (clamp semantics identical to ops.interpolate.bilinear_gather);
    positions/directions: [N, 3]; head_kernel/bias: SliceableDense head
    (rows [:pd] of layer_0 + bias). Returns (out [N, out_dim] in original
    order, overflowed: bool scalar — True only when MORE than patch_cap
    queries sat in overflowing subgroups and the whole call took the exact
    XLA fallback; up to patch_cap overflowed queries are repaired exactly
    in-place (block-level patch) with the kernel path still taken.
    patch_cap=0 restores the strict whole-call-fallback-on-any-overflow
    behavior.
    """
    from ...core.encoding import positional_encoding

    n = coords_xy.shape[0]
    x = jnp.clip(coords_xy[:, 0], 0.0, w_real - 1.0)
    y = jnp.clip(coords_xy[:, 1], 0.0, h_real - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0.0, w_real - 2.0)
    y0 = jnp.clip(jnp.floor(y), 0.0, h_real - 2.0)
    ax = x - x0
    ay = y - y0
    keys = (y0.astype(jnp.int32) * w_pad + x0.astype(jnp.int32))

    n_pad = _round_up(n, bq)
    if n_pad != n:
        pad = n_pad - n
        big = (h_real - 2) * w_pad + (w_real - 2)
        keys = jnp.concatenate([keys, jnp.full((pad,), big, keys.dtype)])
        z3 = jnp.zeros((pad, 3), positions.dtype)
        positions = jnp.concatenate([positions, z3])
        directions = jnp.concatenate([directions, z3])
        zf = jnp.zeros((pad,), ax.dtype)
        ax = jnp.concatenate([ax, zf])
        ay = jnp.concatenate([ay, zf])

    # The transposed kernel carries pixel keys as f32 (Mosaic sublane dims
    # must be multiples of 8, so they ride in the [8, BQ] pdt block): exact
    # only while the largest key < 2^24. Larger images route to the row-major
    # kernel whose keys stay int32 (same math, modestly slower head).
    keys_exact_f32 = h_real * w_pad < 2 ** 24
    use_transposed = fast and embed_direction_vector and keys_exact_f32

    orig = jnp.arange(n_pad, dtype=jnp.int32)
    if use_transposed:
        # Quantize the lerp fractions to 11 bits each and pack both into ONE
        # exact-in-f32 lane (<= 2047*2048+2047 < 2^23): one sort operand and
        # one pdt row instead of two. 2^-11 fraction steps sit below the
        # bf16 triangle/lerp resolution (2^-9) this path already rounds to,
        # so the serving output is unchanged at its own noise floor. The
        # row-major/fallback paths keep exact f32 fractions.
        qx = jnp.floor(ax * 2048.0)
        qy = jnp.floor(ay * 2048.0)
        (keys_s, orig_s, axay_s, px, py, pz, dx, dy, dz) = jax.lax.sort(
            (keys, orig, qx * 2048.0 + qy,
             positions[:, 0], positions[:, 1], positions[:, 2],
             directions[:, 0], directions[:, 1], directions[:, 2]),
            num_keys=1)
        hi = jnp.floor(axay_s * (1.0 / 2048.0))
        ax_s = hi * (1.0 / 2048.0)
        ay_s = (axay_s - hi * 2048.0) * (1.0 / 2048.0)
    else:
        (keys_s, orig_s, ax_s, ay_s, px, py, pz, dx, dy, dz) = jax.lax.sort(
            (keys, orig, ax, ay,
             positions[:, 0], positions[:, 1], positions[:, 2],
             directions[:, 0], directions[:, 1], directions[:, 2]),
            num_keys=1)
    # sub MUST follow the kernel actually taken: the row-major kernel reads
    # one window base per bq-block, so per-SUBgroup bases (sub < bq) would
    # misalign every block past the first — silently gathering zeros
    sub = bq // sg if use_transposed else bq
    s_blocks = keys_s[::sub] // LANE
    # per-(sub)block span check: the largest local index (+1 for the x+1
    # corner) must stay inside the ka*128 window
    span = keys_s[sub - 1::sub] - s_blocks * LANE
    over_sub = span > ka * LANE - 2
    n_over_q = jnp.sum(over_sub.astype(jnp.int32)) * sub
    # Block-level repair (patch_cap > 0): the kernel still runs — an
    # overflowing subgroup's out-of-window queries read all-zero triangle
    # rows (finite garbage) — and up to patch_cap of its queries are then
    # recomputed exactly through the XLA 4-tap path and scattered back in.
    # The whole-call fallback only triggers beyond the patch capacity, so
    # narrow windows (small ka) stay safe on geometries with rare sparse
    # subgroups instead of cliffing the entire call to the slow exact path.
    overflowed = (n_over_q > patch_cap) if patch_cap > 0 \
        else jnp.any(over_sub)

    pos_s = jnp.stack([px, py, pz], axis=-1)
    dir_s = jnp.stack([dx, dy, dz], axis=-1)
    dt = img_grouped.dtype

    def encode(p, d):
        if not fast_encoding:
            enc = positional_encoding(p, n_freq, pos_encoding_freq)
            enc_d = (positional_encoding(d, n_freq, pos_encoding_freq)
                     if embed_direction_vector else d)
            enc = jnp.concatenate([enc, enc_d], axis=-1)
            return (enc.astype(dt) @ head_kernel.astype(dt)
                    + head_bias.astype(dt)).astype(dt)
        # Fast path: double-angle-recurrence octaves + row-permuted head
        # (the transcendentals + interleave were the single largest serving
        # cost — tools/bench_swg.py SWG_BREAKDOWN=1)
        return fast_encode_head(p, d, head_kernel, head_bias, n_freq,
                                pos_encoding_freq, dt,
                                embed_direction_vector)

    def kernel_branch(_):
        if use_transposed:
            # [channels, queries] layout with the geometry head fused into
            # the kernel (in-kernel sin/cos on [6, BQ] uses full lanes; the
            # encodings never touch HBM) — see _swg_kernel_t. The transposed
            # image/weight artifacts are invariants; callers rendering many
            # chunks precompute them once (swg_prepare) so they are not
            # rebuilt inside scan/cond bodies where XLA cannot hoist them.
            pdt = jnp.stack([px, py, pz, dx, dy, dz, axay_s,
                             keys_s.astype(jnp.float32)], axis=0)
            img_t = (jnp.transpose(img_grouped, (0, 2, 1))
                     if img_grouped_t is None else img_grouped_t)
            head_pt = (head_pad_transposed(head_kernel, 3, n_freq).astype(dt)
                       if head_pad_t is None else head_pad_t)
            ft = (transpose_chain_weights(flat_weights) if flat_t is None
                  else flat_t)
            out_t = swg_gather_mlp_t(
                s_blocks, pdt, img_t, head_pt,
                head_bias.astype(jnp.float32), ft, w_groups, n_blocks,
                n_freq=n_freq, base_freq=pos_encoding_freq, readout=True,
                ka=ka, bq=bq, sg=sg, msplit=msplit, interpret=interpret)
            out_s = jnp.transpose(out_t)
        else:
            h0_geo = encode(pos_s, dir_s)
            out_s = swg_gather_mlp(
                s_blocks, keys_s[:, None], jnp.stack([ax_s, ay_s], axis=-1),
                h0_geo, img_grouped, flat_weights, w_groups, n_blocks,
                readout=True, ka=ka, bq=bq, fast=fast, nsplit=nsplit,
                interpret=interpret)
        if patch_cap > 0:
            from .resmlp import resmlp_rows
            from ...ops.interpolate import bilinear_gather

            def do_patch(out_s):
                # overflow is a per-SUBGROUP property, so select at subgroup
                # granularity: nonzero over the [n_pad/sub] flags (a few k
                # elements) instead of a per-query flag vector — a
                # 524k-element nonzero lowers to a full-length cumsum+scatter
                # and cost more than the repair itself (measured: bench
                # 256k -> 170k rays/s)
                cap_sub = max(patch_cap // sub, 1)
                sub_idx = jnp.nonzero(over_sub, size=cap_sub,
                                      fill_value=0)[0]
                valid_sub = over_sub[sub_idx]
                idx = (sub_idx[:, None] * sub
                       + jnp.arange(sub, dtype=sub_idx.dtype)[None, :]
                       ).reshape(-1)                # [cap_sub * sub]
                valid = jnp.repeat(valid_sub, sub)
                xk = (keys_s % w_pad).astype(ax_s.dtype) + ax_s
                yk = (keys_s // w_pad).astype(ay_s.dtype) + ay_s
                n_groups = h_real * w_pad // LANE
                img = img_grouped[:n_groups].reshape(h_real, w_pad,
                                                     img_grouped.shape[-1])
                feats = bilinear_gather(
                    img[None],
                    jnp.stack([xk[idx], yk[idx]], axis=-1)[None])[0]
                h0 = (encode(pos_s[idx], dir_s[idx])
                      + feats.astype(dt)).astype(dt)
                out_p = resmlp_rows(h0, flat_weights, n_blocks,
                                    readout=True,
                                    tile=min(patch_cap, 1024),
                                    skip_input=True, fast=fast,
                                    interpret=interpret)
                return out_s.at[idx].set(
                    jnp.where(valid[:, None], out_p.astype(out_s.dtype),
                              out_s[idx]))

            # most calls have ZERO overflowing subgroups (raster render
            # chunks, wide-window stages) — skip the repair entirely then
            out_s = jax.lax.cond(n_over_q > 0, do_patch,
                                 lambda o: o, out_s)
        # un-permute the narrow outputs with a second sort (cheaper than a
        # scattered row gather at this row count — tools/bench_gather4.py).
        # On the bf16 serving path the four f32 readout logits ride as two
        # bf16-pair int32 lanes (half the payload, 3 sort operands instead
        # of 5); the rounding is the same bf16 resolution the path's
        # matmuls already run at. Exact paths keep the 5-operand sort.
        if use_transposed and out_s.shape[1] == 4:
            def pack2(a, b):
                ha = jax.lax.bitcast_convert_type(
                    a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
                hb = jax.lax.bitcast_convert_type(
                    b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
                return ((ha << 16) | hb).astype(jnp.int32)

            def unpack2(p):
                u = p.astype(jnp.uint32)
                a = jax.lax.bitcast_convert_type(
                    (u >> 16).astype(jnp.uint16), jnp.bfloat16)
                b = jax.lax.bitcast_convert_type(
                    (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
                return a.astype(jnp.float32), b.astype(jnp.float32)

            _, p01, p23 = jax.lax.sort(
                (orig_s, pack2(out_s[:, 0], out_s[:, 1]),
                 pack2(out_s[:, 2], out_s[:, 3])), num_keys=1)
            o0, o1 = unpack2(p01)
            o2, o3 = unpack2(p23)
            return jnp.stack([o0, o1, o2, o3], axis=-1)
        cols = [out_s[:, j] for j in range(out_s.shape[1])]
        unsorted = jax.lax.sort((orig_s, *cols), num_keys=1)
        return jnp.stack(unsorted[1:], axis=-1)

    def fallback_branch(_):
        # exact same math through the plain XLA 4-tap gather + fused chain
        # (original query order; taken only when a window overflows)
        from .resmlp import resmlp_rows
        from ...ops.interpolate import bilinear_gather

        n_groups = h_real * w_pad // LANE
        img = img_grouped[:n_groups].reshape(
            h_real, w_pad, img_grouped.shape[-1])
        feats = bilinear_gather(
            img[None], jnp.stack([jnp.concatenate([x, jnp.zeros(
                (n_pad - n,), x.dtype)]) if n_pad != n else x,
                jnp.concatenate([y, jnp.zeros((n_pad - n,), y.dtype)])
                if n_pad != n else y], axis=-1)[None])[0]
        h0 = (encode(positions, directions) + feats.astype(dt)).astype(dt)
        out = resmlp_rows(h0, flat_weights, n_blocks, readout=True,
                          tile=1024, skip_input=True, fast=fast,
                          interpret=interpret)
        return out.astype(jnp.float32)

    out = jax.lax.cond(overflowed, fallback_branch, kernel_branch,
                       operand=None)
    return out[:n], overflowed
