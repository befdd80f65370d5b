"""Explicit shard_map data/ray-parallel training step.

The default path relies on jit's implicit partitioning (tcnerf.parallel.mesh):
sharded batches in, XLA inserts the psum. This module is the explicit
counterpart (SURVEY.md §2.13 "DP via shard_map/pjit over rays/poses/batch on
the ICI mesh"): the per-shard loss/grad computation is written as a local
function and the gradient reduction is a hand-placed `jax.lax.pmean` over the
('data', 'ray') mesh axes — so the collective schedule is pinned even if
implicit partitioning regresses, and the program is explicit about what rides
the ICI.

Layout (mesh axes from tcnerf.parallel.mesh.make_mesh):
  * 'data'  — batch dimension of every input;
  * 'ray'   — the ray axis of (ray_o, ray_d, labels): this workload's
              sequence axis (SURVEY.md §5);
  * params/opt state — replicated; grads pmean'd over both axes.

The source images (and therefore the encoder forward) are replicated over
'ray'; with ray>1 each ray-shard recomputes the feature towers. That is the
right trade for rendering (features are O(1) per step, rays are O(n)), and
with ray=1 there is no duplication at all.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at the top level
    shard_map = jax.shard_map
    _NO_CHECK = {"check_vma": False}
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
    _NO_CHECK = {"check_rep": False}  # the experimental API's older kwarg


def nerf_in_specs():
    """PartitionSpecs matching tcnerf.parallel.mesh.nerf_batch_shardings."""
    ray = P("data", "ray")
    img = P("data")
    return (ray, ray, img, img, img), ray


def make_explicit_train_step(mesh: Mesh, loss_and_grad_local=None):
    """Build a jitted train step whose grad reduction is an explicit pmean.

    Returns step(state, inputs, labels, rng) -> (state', metrics) with the
    same signature as models.training.nerf_train_step. `state.apply_fn` must
    be the renderer apply (params, inputs, rngs) -> (rgb, depth, fine_rgb,
    fine_depth, aux).
    """
    in_specs, label_spec = nerf_in_specs()

    def local_grads(params, apply_fn, inputs, labels, rng):
        # distinct stochastic samples per shard: fold the mesh position in
        di = jax.lax.axis_index("data")
        ri = jax.lax.axis_index("ray")
        rng = jax.random.fold_in(jax.random.fold_in(rng, di), ri)

        def loss_fn(p):
            rgb, _, fine_rgb, _, aux = apply_fn(
                {"params": p}, inputs, rngs={"sampling": rng})
            loss = (jnp.mean(jnp.square(labels - rgb))
                    + jnp.mean(jnp.square(labels - fine_rgb)) + aux)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # equal shard sizes -> pmean of local means == global mean
        grads = jax.lax.pmean(grads, ("data", "ray"))
        loss = jax.lax.pmean(loss, ("data", "ray"))
        return loss, grads

    @jax.jit
    def step(state, inputs, labels, rng):
        fn = functools.partial(local_grads, apply_fn=state.apply_fn)
        sharded = shard_map(
            lambda p, i, l, r: fn(p, inputs=i, labels=l, rng=r),
            mesh=mesh,
            in_specs=(P(), in_specs, label_spec, P()),
            out_specs=(P(), P()),
            **_NO_CHECK,
        )
        loss, grads = sharded(state.params, inputs, labels, rng)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}

    return step


def make_explicit_ascent_step(mesh: Mesh, energy_fn):
    """Pose-optimization ascent with the guess axis sharded over the mesh.

    energy_fn(poses_t, poses_r, *args) -> per-guess energies [1, N]. The
    returned step computes dE/d(t, r) per local shard of guesses; no
    collective is needed for the ascent itself (guesses are independent) —
    the explicit layout simply pins guesses to ('data', 'ray') so one jitted
    program scales the 4096-guess refinement across the mesh.
    """
    guess_spec = P(None, ("data", "ray"))

    def local(t, r, args):
        def total_energy(t_, r_):
            return -jnp.sum(energy_fn(t_, r_, *args))

        gt, gr = jax.grad(total_energy, argnums=(0, 1))(t, r)
        return gt, gr

    @jax.jit
    def grads(t, r, *args):
        return shard_map(
            lambda t_, r_, a: local(t_, r_, a),
            mesh=mesh,
            in_specs=(guess_spec, guess_spec, P()),
            out_specs=(guess_spec, guess_spec),
            **_NO_CHECK,
        )(t, r, args)

    return grads
