"""Inference-time grasp-pose optimization by gradient ascent on the energy field.

Reference semantics (src/lib/delta_ngf/grasp_optimizer.py:28-186,
src/lib/grasp_mvnerf/grasp_optimizer.py, src/utils/optimization.py:40-153):
thousands of random SE(3) guesses held as (translation, quaternion|6d)
variables; per step, Adam (separate optimizers with exponential-decay LR for t
and r, gated by a [t?, r?] train_config) follows d(sum E)/d(pose); after each
step quaternions/6d are renormalized and translations optionally clipped to the
workspace. Multi-view image sets are folded into the batch axis and energies
summed over it (grasp_optimizer.py:130-157).

TPU-first: the whole n-step ascent is ONE jitted lax.scan program per
(train_config, n_steps) — the reference re-enters a tf.function per step from
a Python loop. The guess axis is embarrassingly parallel and is the natural
shard axis for multi-chip inference (tcnerf.parallel).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import se3
from ..tasks.transform import Affine
from .schedules import exponential_decay


class PoseState(flax.struct.PyTreeNode):
    translations: jnp.ndarray   # [1, N, 3]
    rotations: jnp.ndarray      # [1, N, 4] quaternions or [1, N, 6]
    opt_t: Any
    opt_r: Any


@dataclass(eq=False)
class PoseOptimizer:
    """Energy-ascent refiner around a trained GraspEBM.

    apply_fn/params: the flax apply + params of a GraspEBM;
    n_images source views are folded into the model's n_views batch layout.
    """

    apply_fn: Callable
    params: Any
    workspace_bounds: Any
    n_initial_guesses: int = 32
    n_images: int = 3
    n_views: int = 1
    rotation_representation: str = "quaternion"
    clip_translation: bool = False
    init_lr_t: float = 0.01
    decay_t: float = 0.9
    init_lr_r: Optional[float] = None
    decay_r: Optional[float] = None

    def __post_init__(self):
        if self.n_images % self.n_views:
            raise ValueError("n_images must be divisible by n_views")
        self.batch_size = self.n_images // self.n_views
        if self.init_lr_r is None:
            self.init_lr_r = self.init_lr_t
        if self.decay_r is None:
            self.decay_r = self.decay_t
        self.workspace_bounds = np.asarray(self.workspace_bounds)
        self._rot_dim = 4 if self.rotation_representation == "quaternion" else 6
        self.reset_optimizer()

    # ---------------------------------------------------------------- lifecycle

    def reset_optimizer(self, init_lr_t=None, decay_t=None, init_lr_r=None,
                        decay_r=None):
        """Fresh Adam chains with exponential-decay LR (optimization.py:43-64)."""
        self.tx_t = optax.adam(exponential_decay(init_lr_t or self.init_lr_t,
                                                 decay_t or self.decay_t))
        self.tx_r = optax.adam(exponential_decay(init_lr_r or self.init_lr_r,
                                                 decay_r or self.decay_r))

    def generate_initial_guesses(self, rng=None, n_initial_guesses=None):
        """Uniform random SE(3) guesses in the workspace (grasp_optimizer.py:72-94)."""
        n = n_initial_guesses or self.n_initial_guesses
        rng = np.random.default_rng(rng)
        guesses = [Affine.random(self.workspace_bounds, rng=rng) for _ in range(n)]
        ts = np.array([[g.translation for g in guesses]], dtype=np.float32)
        if self.rotation_representation == "quaternion":
            rs = np.array([[g.quat for g in guesses]], dtype=np.float32)
        else:
            rs = np.array([[np.concatenate([g.rotation[:, 0], g.rotation[:, 1]])
                            for g in guesses]], dtype=np.float32)
        return [ts, rs]

    def init_state(self, initial_guesses) -> PoseState:
        ts, rs = initial_guesses
        assert ts.shape == (1, ts.shape[1], 3)
        assert rs.shape[-1] == self._rot_dim
        ts = jnp.asarray(ts)
        rs = jnp.asarray(rs)
        return PoseState(ts, rs, self.tx_t.init(ts), self.tx_r.init(rs))

    # ----------------------------------------------------------------- energies

    def _fold_views(self, inputs, features):
        """[1, n_images, ...] -> [batch, n_views, ...] (grasp_optimizer.py:141-149)."""
        def fold(x):
            return x.reshape((self.batch_size, self.n_views) + x.shape[2:])
        images, intr, ext = inputs[0], inputs[1], inputs[2]
        return fold(images), fold(intr), fold(ext), fold(features)

    def _energies(self, params, translations, rotations, inputs, features):
        """Per-guess energy summed over the folded view batch -> [N]."""
        images, intr, ext, feats = self._fold_views(inputs, features)
        t = jnp.tile(translations, (self.batch_size, 1, 1))
        r = jnp.tile(rotations, (self.batch_size, 1, 1))
        energies = self.apply_fn(
            {"params": params}, t, r, images, intr, ext, feats,
            self.rotation_representation, method="energy_from_pose_params")
        return jnp.sum(energies, axis=0)

    def _post_process(self, t, r):
        """Projection step: renormalize rotations, clip translations
        (grasp_optimizer.py:126-139)."""
        if self.clip_translation:
            lo = self.workspace_bounds[:, 0]
            hi = self.workspace_bounds[:, 1]
            t = jnp.clip(t, lo, hi)
        if self.rotation_representation == "quaternion":
            r = r / jnp.clip(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)
        else:
            r1 = r[..., :3] / jnp.clip(
                jnp.linalg.norm(r[..., :3], axis=-1, keepdims=True), 1e-12)
            r2 = r[..., 3:] / jnp.clip(
                jnp.linalg.norm(r[..., 3:], axis=-1, keepdims=True), 1e-12)
            r = jnp.concatenate([r1, r2], axis=-1)
        return t, r

    # -------------------------------------------------------------- optimization

    @functools.partial(jax.jit, static_argnames=("self", "train_t", "train_r",
                                                 "n_steps"))
    def _scan_steps(self, params, state: PoseState, inputs, features,
                    train_t: bool, train_r: bool, n_steps: int):
        def step(carry, _):
            st = carry

            def neg_sum_energy(t, r):
                e = self._energies(params, t, r, inputs, features)
                return -jnp.sum(e), e

            (g_t, g_r), energies = jax.grad(
                neg_sum_energy, argnums=(0, 1), has_aux=True)(
                    st.translations, st.rotations)
            t, r = st.translations, st.rotations
            opt_t, opt_r = st.opt_t, st.opt_r
            if train_t:
                up_t, opt_t = self.tx_t.update(jnp.clip(g_t, -1.0, 1.0), opt_t, t)
                t = optax.apply_updates(t, up_t)
            if train_r:
                up_r, opt_r = self.tx_r.update(jnp.clip(g_r, -1.0, 1.0), opt_r, r)
                r = optax.apply_updates(r, up_r)
            t, r = self._post_process(t, r)
            return PoseState(t, r, opt_t, opt_r), energies

        state, energy_trace = jax.lax.scan(step, state, None, length=n_steps)
        return state, energy_trace

    def optimize_pose(self, state: PoseState, inputs, features,
                      train_config=(True, True), n_steps: int = 1):
        """Run `n_steps` ascent steps. Returns (state, energy trace [steps, N])."""
        return self._scan_steps(self.params, state, inputs, features,
                                bool(train_config[0]), bool(train_config[1]),
                                int(n_steps))

    def compute_current_grasp_success(self, state: PoseState, inputs, features):
        return self._current_energies(self.params, state, inputs, features)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _current_energies(self, params, state: PoseState, inputs, features):
        return self._energies(params, state.translations, state.rotations,
                              inputs, features)

    # ------------------------------------------------------------------ results

    def compute_matrices(self, state: PoseState):
        return se3.pose_to_matrix(state.translations, state.rotations,
                                  self.rotation_representation)

    def get_results(self, state: PoseState):
        matrices = np.asarray(self.compute_matrices(state))[0]
        return [Affine.from_matrix(m.astype(np.float64)) for m in matrices]


def compute_results(pose_optimizer: PoseOptimizer, input_data, features,
                    return_trajectory: bool = False, init_poses=None,
                    reset_optimizer: bool = True, n_optimization_steps=1,
                    init_lr_t: float = 0.09, decay_t=None, init_lr_r=None,
                    decay_r=None, sync: bool = False, rng=None):
    """Full refinement schedule: alternating t/r phases or synchronized joint
    ascent (reference src/utils/optimization.py:40-105)."""
    if reset_optimizer:
        pose_optimizer.reset_optimizer(init_lr_t, decay_t,
                                       init_lr_r if init_lr_r is not None else init_lr_t,
                                       decay_r if decay_r is not None else decay_t)
    if init_poses is None:
        init_poses = pose_optimizer.generate_initial_guesses(rng)
    state = pose_optimizer.init_state(init_poses)

    steps_list = (n_optimization_steps if isinstance(n_optimization_steps, list)
                  else [n_optimization_steps])
    start = time.time()
    all_poses = []
    if return_trajectory:
        all_poses.append(pose_optimizer.get_results(state))
    for o_steps in steps_list:
        phases = [(True, False), (False, True)] if not sync else [(True, True)]
        for phase in phases:
            state, _ = pose_optimizer.optimize_pose(state, input_data, features,
                                                    phase, o_steps)
            if return_trajectory:
                all_poses.append(pose_optimizer.get_results(state))
    losses = np.asarray(
        pose_optimizer.compute_current_grasp_success(state, input_data, features)
    ).squeeze()
    duration = time.time() - start
    optimized = pose_optimizer.get_results(state)
    return losses, losses, optimized, optimized, duration, all_poses
