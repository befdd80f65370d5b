"""Training orchestration: resumable sessions, validation, best-checkpoint.

Behavior parity with reference src/utils/training.py:23-72 and
src/utils/util.py:19-139: training_progress.json stores {epoch,
best_mean_error}; training proceeds in chunks of eval_after_epochs with a
validation pass after each chunk; validation results pickle to
valid/results-{epoch}.pkl; the best checkpoint is kept by the combined score
err_t*1000 + err_r*180/pi; `model_final` is written every round.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Callable, List

import numpy as np

from ..opt.pose_optimizer import PoseOptimizer, compute_results
from ..tasks.agents import OracleAgent
from ..utils import wandb_compat as wandb
from ..utils.logging import logger


# ---------------------------------------------------------------- progress I/O

def init_training_session(model_log_dir: str):
    start_epoch = 0
    progress_file = os.path.join(model_log_dir, "training_progress.json")
    if os.path.exists(progress_file):
        with open(progress_file) as f:
            progress = json.load(f)
        start_epoch = progress.get("epoch", 0)
    logger.info(f"Starting training from epoch {start_epoch}")
    return start_epoch, progress_file


def read_best_mean_error(progress_file: str):
    best = [2000, 2000]
    if os.path.exists(progress_file):
        with open(progress_file) as f:
            progress = json.load(f)
        best = progress.get("best_mean_error", best)
    logger.info(f"Best mean error {best}")
    return best


def load_training_progress(eval_after_epochs: int, model_log_dir: str,
                           n_epochs: int):
    start_epoch, progress_file = init_training_session(model_log_dir)
    return (read_best_mean_error(progress_file), n_epochs // eval_after_epochs,
            start_epoch, start_epoch // eval_after_epochs, progress_file)


def error_score(mean_error) -> float:
    """Combined mm + degrees score (reference training.py:56-61)."""
    return mean_error[0] * 1000 + mean_error[1] / np.pi * 180


# ------------------------------------------------------------------ validation

def get_step_results(losses_r, trajectory_r, gt_grasp_pose_h, oracle=None):
    """Top-5 poses by final energy scored against the oracle
    (reference src/utils/optimization.py:108-133)."""
    from scipy.spatial.transform import Rotation

    oracle = oracle or OracleAgent()
    quat = Rotation.from_matrix(np.asarray(gt_grasp_pose_h)[:3, :3]).as_quat()
    gt_pose = [tuple(np.asarray(gt_grasp_pose_h)[:3, 3]), tuple(quat)]

    best_idx = np.argsort(losses_r)[-5:]
    best_poses = [trajectory_r[int(k)] for k in best_idx]
    final_success = [float(losses_r[int(k)]) for k in best_idx]
    errors_r = []
    for pose in best_poses:
        candidate = [tuple(pose.translation), tuple(pose.quat)]
        err = (oracle.calculate_error(gt_pose, candidate)
               if hasattr(oracle, "calculate_error")
               else OracleAgent().calculate_error(gt_pose, candidate))
        errors_r.append(err)
    return {"grasp_poses": best_poses, "final_success": final_success,
            "errors_r": errors_r}


def validate(pose_optimizer: PoseOptimizer, optimization_config: dict,
             valid_data: List, oracle=None, rng=None):
    """Reference validate loop (src/utils/optimization.py:11-37)."""
    results = []
    for i, (input_data, features, task_info, grasp_pose_h) in enumerate(valid_data):
        logger.info(f"Validating on sample {i + 1} with "
                    f"{len(task_info.keys())} objects ...")
        losses_t, losses_r, grasps_t, grasps_r, duration, _ = compute_results(
            pose_optimizer, input_data, features, False, rng=rng,
            **optimization_config)
        result = get_step_results(losses_r, grasps_r, grasp_pose_h, oracle)
        results.append(result)
        best = result["errors_r"][-1]
        logger.info(f"   Best    {best[0] * 1000}    {best[1] / np.pi * 180}")
    return results


def log_results(epoch: int, results, wandb_initialized: bool):
    """Mean/best error aggregation + wandb logging (reference util.py:51-71)."""
    r_errors = [r["errors_r"] for r in results]
    mean_r = np.mean(np.concatenate(r_errors, axis=0), axis=0)
    best_each = [errors[-1] for errors in r_errors]
    best_mean = np.mean(np.stack(best_each, axis=0), axis=0)
    log_dict = {
        "epoch": epoch,
        "mean_r_error_t": mean_r[0] * 1000,
        "mean_r_error_r": mean_r[1] / np.pi * 180,
        "best_r_error_mean_t": best_mean[0] * 1000,
        "best_r_error_mean_r": best_mean[1] / np.pi * 180,
    }
    logger.info(f"   Average   {log_dict['mean_r_error_t']}    "
                f"{log_dict['mean_r_error_r']}")
    logger.info(f"   Best   {log_dict['best_r_error_mean_t']}    "
                f"{log_dict['best_r_error_mean_r']}")
    if wandb_initialized:
        wandb.log(log_dict)
    return log_dict


# ---------------------------------------------------------------- grasp session

def train_grasp_model(fit_epochs_fn: Callable[[int, int], None],
                      store_fn: Callable[[str], None],
                      n_epochs: int, eval_after_epochs: int,
                      model_log_dir: str, model_checkpoint_name: str,
                      grasp_optimizer: PoseOptimizer, optimization_config: dict,
                      wandb_config: dict, valid_data: List, oracle=None,
                      rng=None, refresh_valid_fn=None):
    """Chunked fit/validate/checkpoint loop (reference training.py:23-72).

    fit_epochs_fn(initial_epoch, end_epoch) trains the model in place;
    store_fn(path) writes a checkpoint (per-component layout).
    refresh_valid_fn(valid_data) -> valid_data recomputes the precomputed
    validation features before each validation pass — needed when the
    feature path itself trains (grasp_training.train_fusion); the default
    None keeps the reference's compute-once semantics (util.py:117-130).
    """
    run, wandb_initialized = wandb.init_wandb(wandb_config)
    best_mean_error, n_fits, start_epoch, start_n_fit, progress_file = \
        load_training_progress(eval_after_epochs, model_log_dir, n_epochs)

    # warm-up validation on one sample (reference OOM workaround + here it
    # pre-compiles the ascent program before the timed loop)
    _ = validate(grasp_optimizer, optimization_config, valid_data[:1],
                 oracle, rng)

    for k in range(start_n_fit, n_fits):
        i_epoch = k * eval_after_epochs
        e_epoch = (k + 1) * eval_after_epochs
        fit_epochs_fn(i_epoch, e_epoch)

        if refresh_valid_fn is not None:
            valid_data = refresh_valid_fn(valid_data)
        results = validate(grasp_optimizer, optimization_config, valid_data,
                           oracle, rng)
        os.makedirs(os.path.join(model_log_dir, "valid"), exist_ok=True)
        with open(os.path.join(model_log_dir, "valid",
                               f"results-{e_epoch}.pkl"), "wb") as f:
            pickle.dump(results, f)
        log_results(e_epoch, results, wandb_initialized)

        best_each = [r["errors_r"][-1] for r in results]
        new_mean = list(np.mean(np.stack(best_each, axis=0), axis=0))
        if error_score(new_mean) < error_score(best_mean_error):
            store_fn(os.path.join(model_log_dir, "best"))
            best_mean_error = new_mean
            logger.info(f"New best mean error: {best_mean_error[0] * 1000}, "
                        f"{best_mean_error[1] / np.pi * 180}")

        with open(progress_file, "w") as f:
            json.dump({"epoch": e_epoch, "best_mean_error": best_mean_error}, f)
        store_fn(model_checkpoint_name)
    if wandb_initialized and run is not None:
        run.finish()


# ----------------------------------------------------------- validation inputs

def get_inputs(dataset, sample_idx: int, n_images: int, compute_features_fn,
               tokenize_fn=None):
    """Assemble one validation sample: images from the fixed view convention,
    tokens, precomputed fused features (reference util.py:74-114)."""
    from ..data.generators import camera_parameters

    observations, intrinsics, extrinsics_inv = [], [], []
    tokens = None
    if "language" in dataset.datasets and tokenize_fn is not None:
        text = dataset.datasets["language"].read_sample(sample_idx)
        tokens = np.asarray(tokenize_fn(text), np.int32)

    view_range = range(3, 5) if n_images == 2 else range(0, 3)
    for i in view_range:
        img = dataset.datasets["color"].read_sample_at_idx(
            sample_idx, i)[..., :3] / 255.0
        cfg = dataset.datasets["camera_config"].read_sample_at_idx(sample_idx, i)
        ext_inv, k4 = camera_parameters(cfg)
        observations.append(img)
        intrinsics.append(k4)
        extrinsics_inv.append(ext_inv)

    observations = np.asarray([observations], np.float32)
    intrinsics = np.asarray([intrinsics], np.float32)
    extrinsics_inv = np.asarray([extrinsics_inv], np.float32)
    input_data = [observations, intrinsics, extrinsics_inv, tokens]
    # pull the precomputed features to HOST: at full language scale one
    # sample's fused features are [1, 3, 480, 640, 256] f32 ~ 3.7 GB —
    # keeping all validation samples resident on device starves the 16 GB
    # HBM the training step needs (measured OOM, round 4); the ascent
    # re-transfers them per validation pass instead
    features = compute_features_fn(observations, tokens)
    if features is not None:  # None = deferred to the session refresh
        features = np.asarray(features)
    task_info = (dataset.datasets["info"].read_sample(sample_idx)
                 if "info" in dataset.datasets else {})
    grasp_pose = dataset.datasets["grasp_pose"].read_sample(sample_idx)
    if isinstance(grasp_pose, dict):
        grasp_pose = grasp_pose["grasp_pose"]
    return input_data, features, task_info, grasp_pose
