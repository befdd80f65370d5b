"""Goal-conditioned grasp-EBM training (reference src/train_goal.py).

Trains a GraspReadout head on a frozen NeRF backbone with the 512-pose
CE/KL landscape loss, validating by pose optimization + oracle errors.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..data.generators import GraspMVNeRFDataGenerator
from ..data.loaders import ensure_dataset, load_dataset_baseline
from ..data.prefetch import prefetched_epochs
from ..models import checkpoint as ckpt
from ..models import grasp_training as GT
from ..utils.logging import logger
from .config import main_config
from .grasp_common import (build_grasp_model, build_pose_optimizer,
                           collect_valid_data, init_grasp_state, load_backbone,
                           resume_or_init)
from .session import train_grasp_model


@main_config("../configs", "goal_1_view")
def main(cfg):
    logger.remove()
    logger.add(sys.stderr, level="INFO")
    nm = cfg.nerf_model

    for split, n, seed in (("train", cfg.dataset.get("n_synthetic_samples", 8), 0),
                           ("valid", 8, 1)):
        ensure_dataset(os.path.join(cfg.dataset.path, split),
                       cfg.dataset.n_perspectives, "goal",
                       image_size=tuple(nm.original_image_size), n_samples=n,
                       rng=seed, n_spheres=cfg.dataset.get("n_spheres", 4),
                       azimuth_span_deg=cfg.dataset.get("azimuth_span_deg"))
    train_dataset = load_dataset_baseline(path=cfg.dataset.path,
                                          n_perspectives=cfg.dataset.n_perspectives,
                                          dataset_type="train")
    valid_dataset = load_dataset_baseline(path=cfg.dataset.path,
                                          n_perspectives=cfg.dataset.n_perspectives,
                                          dataset_type="valid")

    data_generator = GraspMVNeRFDataGenerator(
        train_dataset,
        workspace_bounds=[list(b) for b in cfg.generator_grasp.workspace_bounds],
        n_views=nm.n_views,
        n_points_train=cfg.generator_grasp.n_points_train,
        batch_size=cfg.grasp_training.batch_size,
        n_r_fraction=cfg.generator_grasp.get("n_r_fraction", 4),
        rng=cfg.get("seed", 0))

    model = build_grasp_model(cfg)
    sample_inputs, _ = data_generator[0]
    state = init_grasp_state(model, cfg, sample_inputs, cfg.get("seed", 0))
    state, _ = load_backbone(state, cfg)
    state = resume_or_init(state, cfg)

    pose_optimizer = build_pose_optimizer(model, state, cfg)
    valid_data = collect_valid_data(valid_dataset, cfg, model, state)

    loss_name = cfg.grasp_training.get("loss", "cross_entropy")
    # 'sum' reproduces the reference's implicit TF sum-reduction of the KL
    # vector (train_goal.py:51 + model.py:167-168) for strict-parity runs
    loss_reduction = cfg.grasp_training.get("loss_reduction", "mean")
    nt = cfg.grasp_training
    os.makedirs(os.path.join(nt.model_path, "valid"), exist_ok=True)
    model_checkpoint_name = os.path.join(nt.model_path, "model_final")

    state_box = {"state": state}

    def fit_epochs(i_epoch, e_epoch):
        for inputs, labels in prefetched_epochs(data_generator,
                                                e_epoch - i_epoch):
            state_box["state"], metrics = GT.grasp_train_step(
                state_box["state"], inputs, labels, loss_name,
                loss_reduction)
        pose_optimizer.params = state_box["state"].params
        logger.info(f"epoch {e_epoch}: loss {float(metrics['loss']):.5f}")

    def store(path):
        ckpt.store(path, state_box["state"].params, ckpt.GRASP_COMPONENTS)

    oc = cfg.validation.grasp_opt_config.optimization_config.to_dict()
    train_grasp_model(
        fit_epochs, store, nt.n_epochs, nt.eval_after_epochs, nt.model_path,
        model_checkpoint_name, pose_optimizer, oc,
        {"project": "nerf-manipulation", "dir": nt.model_path,
         "config": cfg.to_dict()},
        valid_data, rng=cfg.get("seed", 0))
    return state_box["state"]


if __name__ == "__main__":
    main()
