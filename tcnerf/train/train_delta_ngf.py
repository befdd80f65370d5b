"""Gradient-supervised grasp-field training (reference src/train_delta_ngf.py).

Trains the DeltaNGF energy head with the landscape CE/KL loss plus
second-order gradient supervision along expert trajectories; validation runs
synchronized t+r energy ascent (sync=True, reference :111-113).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..data.generators import DeltaNGFDataGenerator
from ..data.loaders import ensure_dataset, load_dataset
from ..data.prefetch import prefetched_epochs
from ..models import checkpoint as ckpt
from ..models import grasp_training as GT
from ..utils.logging import logger
from .config import main_config
from .grasp_common import (build_grasp_model, build_pose_optimizer,
                           collect_valid_data, init_grasp_state, load_backbone,
                           resume_or_init)
from .session import train_grasp_model


def run_delta_training(cfg, generator_cls=DeltaNGFDataGenerator, sync=True,
                       fusion=None, tokenize_fn=None, wandb_project="ras24"):
    logger.remove()
    logger.add(sys.stderr, level="INFO")
    nm = cfg.nerf_model
    rotation = cfg.grasp_model.get("rotation_representation", "quaternion")

    kind = "language" if tokenize_fn is not None else "grad"
    for split, n, seed in (("train", cfg.dataset.get("n_synthetic_samples", 8), 0),
                           ("valid", 8, 1)):
        ensure_dataset(os.path.join(cfg.dataset.path, split),
                       cfg.dataset.n_perspectives, kind,
                       image_size=tuple(nm.original_image_size), n_samples=n,
                       rng=seed, n_spheres=cfg.dataset.get("n_spheres", 4),
                       azimuth_span_deg=cfg.dataset.get("azimuth_span_deg"))
    if tokenize_fn is not None:
        from ..data.loaders import load_dataset_language
        train_dataset = load_dataset_language(
            cfg.dataset.n_perspectives, os.path.join(cfg.dataset.path, "train"))
        valid_dataset = load_dataset_language(
            cfg.dataset.n_perspectives, os.path.join(cfg.dataset.path, "valid"))
    else:
        train_dataset = load_dataset(
            cfg.dataset.path, cfg.dataset.n_perspectives,
            record_grasp_pose=True,
            record_order=cfg.dataset.get("record_order", False),
            dataset_type="train")
        valid_dataset = load_dataset(
            cfg.dataset.path, cfg.dataset.n_perspectives,
            record_grasp_pose=True,
            record_order=cfg.dataset.get("record_order", False),
            dataset_type="valid")
        # validation needs 'language'/'info' only when present; get_inputs guards

    gen_kwargs = dict(
        workspace_bounds=[list(b) for b in cfg.generator_grasp.workspace_bounds],
        n_views=nm.n_views, batch_size=cfg.grasp_training.batch_size,
        pose_augmentation_factor=cfg.generator_grasp.pose_augmentation_factor,
        n_future_poses=cfg.generator_grasp.n_future_poses,
        rotation_representation=rotation, rng=cfg.get("seed", 0))
    if tokenize_fn is not None:
        gen_kwargs["tokenize_fn"] = tokenize_fn
    data_generator = generator_cls(train_dataset, **gen_kwargs)

    model = build_grasp_model(cfg, fusion=fusion)
    inputs0, _ = data_generator[0]
    # init with pose matrices derived from the landscape sub-batch
    from ..core import se3
    import jax.numpy as jnp
    poses0 = se3.pose_to_matrix(jnp.asarray(inputs0[0]), jnp.asarray(inputs0[1]),
                                rotation)
    init_inputs = (poses0, jnp.asarray(inputs0[4]), jnp.asarray(inputs0[5]),
                   jnp.asarray(inputs0[6]))
    # trainable components: reference = grasp_readout only. train_fusion
    # co-trains the fusion decoder (language stage without real CLIP
    # weights); train_hash_tables learns the hash-grid encoding instead of
    # using it as frozen random features.
    trainable = ("grasp_readout",)
    train_fusion = (fusion is not None
                    and cfg.grasp_training.get("train_fusion", False))
    if train_fusion:
        trainable = trainable + ("combine_clip_visual",)
    if (cfg.grasp_model.get("encoding", "fourier") == "hashgrid"
            and cfg.grasp_training.get("train_hash_tables", False)):
        trainable = trainable + ("hash_tables",)
    if fusion is not None:
        import jax
        dummy_tokens = jnp.zeros((inputs0[4].shape[0], 77), jnp.int32)
        params = model.init(jax.random.PRNGKey(cfg.get("seed", 0)), *init_inputs,
                            dummy_tokens, method="init_all")["params"]
        state = GT.create_grasp_train_state(
            model, params, learning_rate=cfg.grasp_training.learning_rate,
            trainable=trainable)
    else:
        state = init_grasp_state(model, cfg, init_inputs, cfg.get("seed", 0),
                                 trainable=trainable)
    state, _ = load_backbone(state, cfg, fusion=fusion is not None)
    state = resume_or_init(
        state, cfg, extra_components=(("combine_clip_visual",)
                                      if fusion is not None else ()))

    pose_optimizer = build_pose_optimizer(model, state, cfg)
    valid_data = collect_valid_data(valid_dataset, cfg, model, state,
                                    tokenize_fn,
                                    defer_features=train_fusion)

    loss_name = cfg.grasp_training.get("loss", "cross_entropy")
    nt = cfg.grasp_training
    os.makedirs(os.path.join(nt.model_path, "valid"), exist_ok=True)
    model_checkpoint_name = os.path.join(nt.model_path, "model_final")
    use_tokens = tokenize_fn is not None
    state_box = {"state": state}

    def fit_epochs(i_epoch, e_epoch):
        metrics = {}
        for inputs, labels in prefetched_epochs(data_generator,
                                                e_epoch - i_epoch):
            state_box["state"], metrics = GT.delta_ngf_train_step(
                state_box["state"], inputs, list(labels), loss_name, rotation,
                use_tokens)
        pose_optimizer.params = state_box["state"].params
        logger.info(
            f"epoch {e_epoch}: " + " ".join(
                f"{k}={float(v):.4f}" for k, v in metrics.items()))

    def store(path):
        components = ckpt.GRASP_COMPONENTS
        if fusion is not None:
            components = components + ("combine_clip_visual",)
        ckpt.store(path, state_box["state"].params, components)

    refresh_valid_fn = None
    if train_fusion:
        import jax

        # one jitted program reused across evals (params ride as an
        # argument — large closed-over constants ship with every remote
        # compile request on axon)
        feat_fn = jax.jit(lambda p, obs, tok: model.apply(
            {"params": p}, obs, tok, method="compute_features"))

        def refresh_valid_fn(valid_data):
            # the decoder trained — the precomputed fused validation
            # features are stale; recompute with the current params.
            # np.asarray: features live on HOST between validations (4
            # full-scale samples ~ 15 GB would starve HBM — see get_inputs)
            p = state_box["state"].params
            return [(inp, np.asarray(feat_fn(p, jnp.asarray(inp[0],
                                                            jnp.float32),
                                             inp[3])), info, gp)
                    for (inp, _feats, info, gp) in valid_data]

    oc = cfg.validation.grasp_opt_config.optimization_config.to_dict()
    oc["sync"] = sync
    train_grasp_model(
        fit_epochs, store, nt.n_epochs, nt.eval_after_epochs, nt.model_path,
        model_checkpoint_name, pose_optimizer, oc,
        {"project": wandb_project, "dir": nt.model_path, "config": cfg.to_dict()},
        valid_data, rng=cfg.get("seed", 0), refresh_valid_fn=refresh_valid_fn)
    return state_box["state"]


@main_config("../configs", "dngf_1_view")
def main(cfg):
    return run_delta_training(cfg, sync=True)


if __name__ == "__main__":
    main()
