"""Pure-functional training for the NeRF renderer.

Reference orchestration: src/train_nerf.py:20-34 (MultiOptimizer with two
warmup-Adam groups + per-value gradient clipping at +-1.0,
src/lib/mvnerf/model_v0.py:186-197). Here the optimizer is one
optax.multi_transform over the param tree:
  * 'nerf' group (lr 1e-4): coarse/fine embeddings + readouts + fusion decoder
    (the reference's MultiOptimizer listed only the embeddings; routing the
    readouts/fusion with the same LR is the rational completion — unlisted
    variables would not train at all under tfa.MultiOptimizer);
  * 'feature' group (lr 1e-5): the ViT+conv visual encoder;
  * 'frozen': CLIP towers (reference keeps CLIP trainable=False).

The train step is a single jitted pure function: (state, batch, rng) -> state'.
Data parallelism is applied outside by sharding the batch (see
tcnerf.parallel); gradients reduce over the mesh via jit's implicit psum.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..opt.schedules import warmup_constant_schedule

NERF_COMPONENTS = ("coarse_embedding", "coarse_readout", "fine_embedding",
                   "fine_readout", "combine_clip_visual")
FEATURE_COMPONENTS = ("visual_features",)
FROZEN_COMPONENTS = ("clip_visual", "clip_textual")


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def param_group(path) -> str:
    top = path[0] if isinstance(path[0], str) else path[0].key
    if top in FROZEN_COMPONENTS:
        return "frozen"
    if top in FEATURE_COMPONENTS:
        return "feature"
    return "nerf"


def make_nerf_optimizer(nerf_lr: float = 1e-4, feature_lr: float = 1e-5,
                        warmup_steps: int = 10000, scale_down_after: int = 450000,
                        grad_clip: float = 1.0) -> optax.GradientTransformation:
    def adam(lr):
        return optax.chain(
            optax.clip(grad_clip),
            optax.adam(warmup_constant_schedule(lr, warmup_steps, scale_down_after)),
        )

    return optax.multi_transform(
        {"nerf": adam(nerf_lr), "feature": adam(feature_lr),
         "frozen": optax.set_to_zero()},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: param_group(path), params),
    )


def create_train_state(model, rng, sample_inputs,
                       tx: Optional[optax.GradientTransformation] = None) -> TrainState:
    params_rng, sampling_rng = jax.random.split(rng)
    variables = model.init({"params": params_rng, "sampling": sampling_rng},
                           sample_inputs)
    tx = tx or make_nerf_optimizer()
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx, apply_fn=model.apply)


def mse(a, b):
    return jnp.mean(jnp.square(a - b))


@functools.partial(jax.jit, static_argnames=())
def nerf_train_step(state: TrainState, inputs, labels, rng):
    """One optimization step: loss = MSE(coarse) + MSE(fine) (+ aux fusion loss)."""

    def loss_fn(params):
        rgb, depth, fine_rgb, fine_depth, aux = state.apply_fn(
            {"params": params}, inputs, rngs={"sampling": rng})
        loss = mse(labels, rgb) + mse(labels, fine_rgb) + aux
        return loss, (rgb, fine_rgb)

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)
    return new_state, {"loss": loss}


def psnr(pred, target):
    return -10.0 * jnp.log10(jnp.mean(jnp.square(pred - target)) + 1e-12)
