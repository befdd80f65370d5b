"""Orchestration tests for train_grasp_model (reference utils/training.py
semantics): chunked fit/validate loop, results pickling, best-checkpoint by
combined error score, progress persistence and resume. Uses a duck-typed fake
pose optimizer so no jit compiles are involved."""

import json
import os
import pickle

import numpy as np

from tcnerf.tasks.transform import Affine
from tcnerf.train.session import train_grasp_model


class FakeOptimizer:
    """Duck-type of tcnerf.opt.pose_optimizer.PoseOptimizer whose guesses
    converge toward the ground-truth pose as `quality` improves."""

    def __init__(self, gt_translation):
        self.gt = np.asarray(gt_translation)
        self.quality = 0.0  # improves when the fake fit runs
        self.params = None

    def reset_optimizer(self, *a, **k):
        pass

    def generate_initial_guesses(self, rng=None, n_initial_guesses=None):
        rng = np.random.default_rng(rng)
        ts = rng.uniform(0, 1, (1, 8, 3)).astype(np.float32)
        qs = np.tile([0, 0, 0, 1], (1, 8, 1)).astype(np.float32)
        return [ts, qs]

    def init_state(self, guesses):
        return {"t": guesses[0].copy(), "q": guesses[1].copy()}

    def optimize_pose(self, state, inputs, features, train_config, n_steps):
        # move a fraction toward gt proportional to training quality
        state["t"] = state["t"] + self.quality * (self.gt - state["t"])
        return state, None

    def compute_current_grasp_success(self, state, inputs, features):
        d = np.linalg.norm(state["t"][0] - self.gt, axis=-1)
        return -d  # higher energy = closer

    def get_results(self, state):
        return [Affine(translation=t) for t in state["t"][0]]


def test_train_grasp_model_loop(tmp_path):
    gt_pose = np.eye(4)
    gt_pose[:3, 3] = [0.5, 0.0, 0.1]
    optimizer = FakeOptimizer(gt_pose[:3, 3])

    fits = []

    def fit_epochs(i_epoch, e_epoch):
        fits.append((i_epoch, e_epoch))
        optimizer.quality = min(1.0, optimizer.quality + 0.5)

    stored = []

    def store(path):
        stored.append(path)
        with open(path + "_grasp_readout.msgpack", "wb") as f:
            f.write(b"ckpt")

    valid_data = [([None, None, None, None], None, {"obj": {}}, gt_pose)]
    log_dir = str(tmp_path)
    train_grasp_model(fit_epochs, store, n_epochs=4, eval_after_epochs=2,
                      model_log_dir=log_dir,
                      model_checkpoint_name=os.path.join(log_dir, "model_final"),
                      grasp_optimizer=optimizer,
                      optimization_config={"n_optimization_steps": 2,
                                           "init_lr_t": 0.1, "decay_t": 0.9,
                                           "sync": True},
                      wandb_config={"project": "t", "dir": log_dir},
                      valid_data=valid_data, rng=0)

    # two fit chunks of two epochs
    assert fits == [(0, 2), (2, 4)]
    # results pickled per eval
    for epoch in (2, 4):
        with open(os.path.join(log_dir, "valid", f"results-{epoch}.pkl"),
                  "rb") as f:
            results = pickle.load(f)
        assert "errors_r" in results[0] and len(results[0]["errors_r"]) == 5
    # best checkpoint written (error improved between evals)
    assert any(p.endswith("best") for p in stored)
    assert any(p.endswith("model_final") for p in stored)
    # progress recorded
    with open(os.path.join(log_dir, "training_progress.json")) as f:
        progress = json.load(f)
    assert progress["epoch"] == 4
    assert progress["best_mean_error"][0] < 2000

    # resume: rerun -> no additional fits
    fits.clear()
    train_grasp_model(fit_epochs, store, n_epochs=4, eval_after_epochs=2,
                      model_log_dir=log_dir,
                      model_checkpoint_name=os.path.join(log_dir, "model_final"),
                      grasp_optimizer=optimizer,
                      optimization_config={"n_optimization_steps": 2,
                                           "init_lr_t": 0.1, "decay_t": 0.9,
                                           "sync": True},
                      wandb_config={"project": "t", "dir": log_dir},
                      valid_data=valid_data, rng=0)
    assert fits == []
