"""Training steps for the grasp-energy models.

Reference semantics:
  * GraspMVNeRF.train_step (src/lib/grasp_mvnerf/model.py:160-171): loss over
    the N-pose batch — CategoricalCrossentropy(from_logits=True) or
    KLDivergence after softmax — gradients only into grasp_readout, clipped
    at +-1.0, Adam(1e-4).
  * DeltaNGF.train_step (src/lib/delta_ngf/model.py:254-309): the same
    landscape loss PLUS gradient supervision — the inner jax.grad of the
    energy w.r.t. pose parameters is matched to the expert pose deltas by
    cosine-similarity losses; the total backpropagates through the inner
    gradient (second-order) into grasp_readout only.

Design: features are encoded ONCE outside the differentiated function and the
loss is differentiated w.r.t. the readout params only, so the frozen
backbone/CLIP towers never get a backward pass (the reference relies on
`watch_accessed_variables=False` but still pays the full backward).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax


def categorical_crossentropy_logits(labels, logits):
    """keras CategoricalCrossentropy(from_logits=True), mean over batch."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(labels * log_p, axis=-1))


def kl_divergence(labels, probs, eps: float = 1e-7, reduction: str = "mean"):
    """keras KLDivergence: sum(y_true * log(y_true / y_pred)) per sample.

    NOTE: train_goal's reference constructs KLDivergence(reduction=NONE) and
    lets TF implicitly SUM the per-sample vector through tape.gradient
    (train_goal.py:51, model.py:167-168) — a batch-size-dependent scale.
    The default here is the mean (matching the delta/language trainers'
    reduction), equivalent up to a constant factor absorbed by the learning
    rate; `reduction='sum'` reproduces the reference scale exactly for
    strict-parity runs (config key grasp_training.loss_reduction)."""
    y_true = jnp.clip(labels, eps, 1.0)
    y_pred = jnp.clip(probs, eps, 1.0)
    per_sample = jnp.sum(y_true * jnp.log(y_true / y_pred), axis=-1)
    return jnp.sum(per_sample) if reduction == "sum" else jnp.mean(per_sample)


def cosine_similarity_loss(y_true, y_pred, eps: float = 1e-12):
    """keras CosineSimilarity loss: -mean cosine similarity along axis -1."""
    t = y_true / jnp.clip(jnp.linalg.norm(y_true, axis=-1, keepdims=True), eps)
    p = y_pred / jnp.clip(jnp.linalg.norm(y_pred, axis=-1, keepdims=True), eps)
    return -jnp.mean(jnp.sum(t * p, axis=-1))


def landscape_loss_fn(loss_name: str, reduction: str = "mean"):
    if loss_name == "cross_entropy":
        return categorical_crossentropy_logits, False
    if loss_name == "kl_divergence":
        return functools.partial(kl_divergence, reduction=reduction), True
    raise ValueError(f"Loss {loss_name} not supported.")


class GraspTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any                       # full param tree (backbone + readout + clip)
    opt_state: Any                    # optimizer state over the trainable subtree
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    # which top-level components train. The reference trains grasp_readout
    # ONLY (model.py:160-171, delta_ngf/model.py:294-296) — that stays the
    # default. The language stage may additionally co-train the fusion
    # decoder (grasp_training.train_fusion): without real pretrained CLIP
    # weights the frozen random text pathway carries no semantics, so the
    # text-conditioned decoder must learn at stage 2 (beyond-reference
    # option, documented in docs/convergence.md).
    trainable: tuple = flax.struct.field(pytree_node=False,
                                         default=("grasp_readout",))


def make_grasp_optimizer(learning_rate: float = 1e-4,
                         grad_clip: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(optax.clip(grad_clip), optax.adam(learning_rate))


def create_grasp_train_state(model, params, learning_rate: float = 1e-4,
                             trainable=("grasp_readout",)):
    tx = make_grasp_optimizer(learning_rate)
    sub = {c: params[c] for c in trainable}
    return GraspTrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(sub), tx=tx,
                           apply_fn=model.apply, trainable=tuple(trainable))


def _merged(params, sub):
    new = dict(params)
    new.update(sub)
    return new


def _trainable_sub(state: GraspTrainState):
    return {c: state.params[c] for c in state.trainable}


@functools.partial(jax.jit, static_argnames=("loss_name", "loss_reduction"))
def grasp_train_step(state: GraspTrainState, inputs, labels,
                     loss_name: str = "cross_entropy",
                     loss_reduction: str = "mean"):
    """Goal-conditioned EBM step. inputs = [poses, src_images, src_intrinsics,
    src_extrinsics_inv] (reference generator layout, grasp_mvnerf.py:57-63)."""
    poses, src_images, src_intr, src_ext = inputs
    loss_fn_, softmax_before = landscape_loss_fn(loss_name, loss_reduction)

    features = state.apply_fn({"params": state.params}, src_images,
                              method="encode")

    def loss_fn(sub):
        energies = state.apply_fn(
            {"params": _merged(state.params, sub)},
            poses, src_images, src_intr, src_ext, features, method="energy")
        if softmax_before:
            energies = jax.nn.softmax(energies)
        return loss_fn_(labels, energies)

    sub = _trainable_sub(state)
    loss, grads = jax.value_and_grad(loss_fn)(sub)
    updates, new_opt = state.tx.update(grads, state.opt_state, sub)
    new_sub = optax.apply_updates(sub, updates)
    return state.replace(step=state.step + 1,
                         params=_merged(state.params, new_sub),
                         opt_state=new_opt), {"loss": loss}


@functools.partial(jax.jit,
                   static_argnames=("loss_name", "rotation_representation",
                                    "use_tokens"))
def delta_ngf_train_step(state: GraspTrainState, inputs, labels,
                         loss_name: str = "cross_entropy",
                         rotation_representation: str = "quaternion",
                         use_tokens: bool = False):
    """Gradient-supervised EBM step (DeltaNGF / LanguageNeRF).

    inputs = [landscape_t, landscape_r, grad_t, grad_r, src_images,
    src_intrinsics, src_extrinsics_inv(, clip_tokens)];
    labels = [landscape_onehot, delta_t, delta_r]
    (reference generator layout, delta_ngf.py:187-205, language.py:177-200).
    """
    l_t, l_r, g_t, g_r, src_images, src_intr, src_ext = inputs[:7]
    clip_tokens = inputs[7] if use_tokens else None
    loss_fn_, softmax_before = landscape_loss_fn(loss_name)

    train_fusion = "combine_clip_visual" in state.trainable
    fusion_in = features0 = None
    if train_fusion:
        # the frozen towers run once outside the differentiated function;
        # the fusion decoder (trainable) applies INSIDE it so its gradients
        # flow — everything else matches the frozen-fusion path exactly
        fusion_in = state.apply_fn({"params": state.params}, src_images,
                                   clip_tokens, method="fusion_inputs")
    else:
        features0 = state.apply_fn({"params": state.params}, src_images,
                                   clip_tokens, method="compute_features")

    def loss_fn(sub):
        params = _merged(state.params, sub)
        features = (state.apply_fn({"params": params}, *fusion_in,
                                   method="apply_fusion")
                    if train_fusion else features0)

        def energy(t, r):
            return state.apply_fn(
                {"params": params}, t, r, src_images, src_intr, src_ext,
                features, rotation_representation,
                method="energy_from_pose_params")

        # (a) landscape loss on labeled final-pose batch
        y_pred = energy(l_t, l_r)
        if softmax_before:
            y_pred = jax.nn.softmax(y_pred)
        landscape = loss_fn_(labels[0], y_pred)

        # (b) gradient supervision along augmented trajectory windows
        def energy_sum(t, r):
            pred = energy(t, r)
            return jnp.sum(pred), pred

        (grad_t, grad_r), prediction = jax.grad(
            energy_sum, argnums=(0, 1), has_aux=True)(g_t, g_r)
        loss_t = cosine_similarity_loss(labels[1], grad_t)
        if rotation_representation == "quaternion":
            loss_r = cosine_similarity_loss(labels[2], grad_r)
        else:  # 6d: per-column cosine losses (reference model.py:286-290)
            loss_r = (cosine_similarity_loss(labels[2][..., :3], grad_r[..., :3])
                      + cosine_similarity_loss(labels[2][..., 3:], grad_r[..., 3:]))

        total = loss_t + loss_r + landscape
        return total, {"landscape_loss": landscape, "grad_loss_t": loss_t,
                       "grad_loss_r": loss_r, "pred": jnp.mean(prediction)}

    sub = _trainable_sub(state)
    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(sub)
    updates, new_opt = state.tx.update(grads, state.opt_state, sub)
    new_readout = optax.apply_updates(sub, updates)
    return state.replace(step=state.step + 1,
                         params=_merged(state.params, new_readout),
                         opt_state=new_opt), metrics
