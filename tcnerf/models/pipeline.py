"""Grasp inference pipeline — the deployment-facing API.

Wraps what the reference scatters across utils/{util,optimization}.py and the
entry points: load a trained grasp model (+ backbone), encode a scene's source
views once, refine thousands of SE(3) guesses by energy ascent, and return the
top-k grasp poses with scores. Everything device-side after `encode`.

Example:
    pipe = GraspPipeline.from_checkpoints(model, ckpt_dir, workspace_bounds)
    result = pipe.infer(images, intrinsics, extrinsics_inv, text="grasp the red ball")
    result.poses[0]  # best Affine
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import numpy as np

from ..opt.pose_optimizer import PoseOptimizer
from ..tasks.transform import Affine
from . import checkpoint as ckpt


@dataclass
class GraspResult:
    poses: List[Affine]          # best-first
    scores: List[float]
    duration_s: float
    all_energies: np.ndarray     # [n_guesses]


@dataclass
class GraspPipeline:
    model: object                 # GraspEBM
    params: dict
    workspace_bounds: object
    n_initial_guesses: int = 4096
    n_images: int = 1
    rotation_representation: str = "quaternion"
    clip_translation: bool = True
    n_optimization_steps: int = 16
    init_lr_t: float = 0.05
    init_lr_r: float = 0.05
    decay_t: float = 0.9
    decay_r: float = 0.09
    sync: bool = True
    tokenize_fn: Optional[object] = None
    top_k: int = 5
    _optimizer: PoseOptimizer = field(default=None, repr=False)

    @classmethod
    def from_checkpoints(cls, model, model_dir: str, workspace_bounds,
                         backbone_dir: Optional[str] = None, **kwargs):
        """Load `model_final` (and optionally a separate backbone) like the
        reference's load/load_backbone (grasp_mvnerf/model.py:67-101)."""
        import os

        import jax.numpy as jnp

        # init params structurally from tiny dummy inputs
        v = model.n_views
        h, w = model.original_image_size
        dummy_imgs = jnp.zeros((1, v, h, w, 3))
        dummy_intr = jnp.tile(jnp.eye(4), (1, v, 1, 1))
        poses = jnp.tile(jnp.eye(4), (1, 2, 1, 1))
        if model.fusion is not None:
            tokens = jnp.zeros((1, 77), jnp.int32)
            params = model.init(jax.random.PRNGKey(0), poses, dummy_imgs,
                                dummy_intr, dummy_intr, tokens,
                                method="init_all")["params"]
        else:
            params = model.init(jax.random.PRNGKey(0), poses, dummy_imgs,
                                dummy_intr, dummy_intr)["params"]
        if backbone_dir:
            restored = ckpt.load(os.path.join(backbone_dir, "model_final"),
                                 params, ckpt.BACKBONE_COMPONENTS)
            params = restored or params
        restored = ckpt.load(os.path.join(model_dir, "model_final"), params,
                             ckpt.GRASP_COMPONENTS)
        params = restored or params
        return cls(model=model, params=params,
                   workspace_bounds=workspace_bounds, **kwargs)

    def _ensure_optimizer(self):
        if self._optimizer is None:
            self._optimizer = PoseOptimizer(
                apply_fn=self.model.apply, params=self.params,
                workspace_bounds=self.workspace_bounds,
                n_initial_guesses=self.n_initial_guesses,
                n_images=self.n_images, n_views=self.model.n_views,
                rotation_representation=self.rotation_representation,
                clip_translation=self.clip_translation,
                init_lr_t=self.init_lr_t, decay_t=self.decay_t,
                init_lr_r=self.init_lr_r, decay_r=self.decay_r)
        return self._optimizer

    def encode(self, images, text: Optional[str] = None):
        """[1, n_images, H, W, 3] float in [0,1] -> feature image."""
        tokens = None
        if text is not None:
            if self.tokenize_fn is None:
                from ..clip.tokenizer import tokenize
                self.tokenize_fn = tokenize
            tokens = np.asarray(self.tokenize_fn(text), np.int32)
        return self.model.apply({"params": self.params},
                                np.asarray(images, np.float32), tokens,
                                method="compute_features")

    def infer(self, images, intrinsics, extrinsics_inv,
              text: Optional[str] = None, rng=None) -> GraspResult:
        """Full inference: encode -> generate guesses -> energy ascent -> top-k."""
        import time

        opt = self._ensure_optimizer()
        opt.params = self.params
        features = self.encode(images, text)
        inputs = (np.asarray(images, np.float32),
                  np.asarray(intrinsics, np.float32),
                  np.asarray(extrinsics_inv, np.float32))

        start = time.time()
        opt.reset_optimizer()
        state = opt.init_state(opt.generate_initial_guesses(rng))
        phases = ([(True, True)] if self.sync
                  else [(True, False), (False, True)])
        for phase in phases:
            state, _ = opt.optimize_pose(state, inputs, features, phase,
                                         self.n_optimization_steps)
        energies = np.asarray(
            opt.compute_current_grasp_success(state, inputs, features)).squeeze()
        duration = time.time() - start

        order = np.argsort(energies)[::-1][: self.top_k]
        results = opt.get_results(state)
        return GraspResult(poses=[results[int(i)] for i in order],
                           scores=[float(energies[int(i)]) for i in order],
                           duration_s=duration, all_energies=energies)


def _demo(model_dir: Optional[str] = None):  # pragma: no cover - CLI demo
    """`python -m tcnerf.models.pipeline [model_dir]` — run the pipeline on a
    synthetic scene (random-init params when no checkpoint dir is given)."""
    import jax.numpy as jnp

    from ..data.generators import camera_parameters
    from ..data.synthetic import SyntheticScene, generate_views
    from .grasp import GraspEBM

    h, w = 48, 64
    scene = SyntheticScene.random(0, n_spheres=2)
    colors, configs = generate_views(scene, 2, height=h, width=w,
                                     radius=1.0, polar=0.6)
    images = np.asarray(colors[0][..., :3] / 255.0, np.float32)[None, None]
    ext_inv, k4 = camera_parameters(configs[0])
    intr = np.asarray(k4, np.float32)[None, None]
    ext = np.asarray(ext_inv, np.float32)[None, None]

    model = GraspEBM(n_views=1, n_features=32, original_image_size=(h, w),
                     n_5d_poses=3, n_blocks=2, hidden_size=32,
                     vit_size=(32, 32), vit_patch=16, vit_dim=32, vit_heads=2,
                     vit_hooks=(1, 2, 3, 4))
    workspace = ((0.3, 0.7), (-0.25, 0.25), (0.0, 0.3))
    if model_dir:
        pipe = GraspPipeline.from_checkpoints(model, model_dir, workspace,
                                              n_initial_guesses=64,
                                              n_optimization_steps=4)
    else:
        poses = jnp.tile(jnp.eye(4), (1, 2, 1, 1)).astype(jnp.float32)
        params = model.init(jax.random.PRNGKey(0), poses,
                            jnp.asarray(images), jnp.asarray(intr),
                            jnp.asarray(ext))["params"]
        pipe = GraspPipeline(model=model, params=params,
                             workspace_bounds=workspace,
                             n_initial_guesses=64, n_optimization_steps=4)
    result = pipe.infer(images, intr, ext, rng=0)
    print(f"refined {len(result.all_energies)} guesses in "
          f"{result.duration_s:.2f}s; top-{len(result.poses)}:")
    for pose, score in zip(result.poses, result.scores):
        t = np.round(pose.translation, 3)
        print(f"  energy={score:+.4f} t={t} quat={np.round(pose.quat, 3)}")


if __name__ == "__main__":
    import sys

    _demo(sys.argv[1] if len(sys.argv) > 1 else None)
