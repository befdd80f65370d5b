"""Measure sort/unsort payload-packing variants at serving shapes (TPU).

The swg serving path pays two sort passes per stage (docs/perf_notes.md:
pack 1.26/1.77 ms + sort 0.34/0.84 ms + unsort 0.57/1.37 ms per
coarse/fine stage at 8192-ray chunks). Candidates measured here:

  unsort5   — current: lax.sort((orig, out0..out3), num_keys=1)
  unsort3   — outputs bitcast-packed pairwise (4 x bf16 -> 2 x f32 lanes,
              or 4 x f32 -> 2 x f64-equivalent via int32 pairs):
              lax.sort((orig, packed0, packed1), num_keys=1)
  sort10    — current forward pack: 10-operand variadic sort
  sort9     — ax/ay packed into one int32 (two bf16 halves)

Packing happens INSIDE the timed loop on iteration-dependent data, since
the real serving path re-packs every chunk — measuring only the smaller
sort would overstate the win.

Run on the chip:  python tools/bench_sortpack.py [n]
Prints ms per variant (K-iteration fori_loop, host-pull timing — the
tunnel's dispatch overhead rules out single-shot timing).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    # host pull = real sync through the axon tunnel
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    return dt


def main(n=524288):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    f = lambda i: jax.random.uniform(ks[i], (n,), jnp.float32)
    keys = jax.random.randint(ks[0], (n,), 0, 1 << 20).astype(jnp.float32)
    orig = jax.random.permutation(ks[1], n).astype(jnp.int32)
    outs = [f(i) for i in range(2, 6)]
    ax, ay = f(6), f(7)
    pos = [f(8), f(9), f(10)]
    dirs = [f(11), f(12), f(13)]

    def loop(body):
        @jax.jit
        def run():
            def step(i, c):
                r = body(c)
                return r[0][:1].astype(jnp.float32).sum() + c * 0
            return jax.lax.fori_loop(0, 20, step, jnp.zeros(()))
        return run

    def pack2(a, b):
        ha = jax.lax.bitcast_convert_type(
            a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        hb = jax.lax.bitcast_convert_type(
            b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        return (ha << 16 | hb).astype(jnp.int32)

    def unpack2(p):
        u = p.astype(jnp.uint32)
        a = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16),
                                         jnp.bfloat16)
        b = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16),
                                         jnp.bfloat16)
        return a, b

    # --- unsort variants (pack/unpack INSIDE the loop, carry-dependent)
    unsort5 = loop(lambda c: jax.lax.sort(
        (orig + c.astype(jnp.int32), *[o + c for o in outs]), num_keys=1))

    def unsort3_body(c):
        p01 = pack2(outs[0] + c, outs[1] + c)
        p23 = pack2(outs[2] + c, outs[3] + c)
        s = jax.lax.sort((orig + c.astype(jnp.int32), p01, p23), num_keys=1)
        a, b = unpack2(s[1])
        cc, d = unpack2(s[2])
        return (a.astype(jnp.float32) + b + cc + d,)

    unsort3 = loop(unsort3_body)

    # --- forward pack variants
    sort10 = loop(lambda c: jax.lax.sort(
        (keys + c, orig, ax + c, ay + c, *pos, *dirs), num_keys=1))

    def sort9_body(c):
        axay = pack2(ax + c, ay + c)
        return jax.lax.sort((keys + c, orig, axay, *pos, *dirs), num_keys=1)

    sort9 = loop(sort9_body)

    for name, fn in [("unsort5", unsort5), ("unsort3", unsort3),
                     ("sort10", sort10), ("sort9", sort9)]:
        print(f"{name}: {timed(fn):8.3f} ms  (n={n})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 524288)
