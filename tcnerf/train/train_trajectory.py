"""Trajectory grasp-field training (reference src/train_trajectory.py):
DeltaNGF training with alternating t/r validation ascent (sync=False)."""

from __future__ import annotations

from .config import main_config
from .train_delta_ngf import run_delta_training


@main_config("../configs", "trajectory_1_view-2")
def main(cfg):
    return run_delta_training(cfg, sync=False, wandb_project="nerf-manipulation")


if __name__ == "__main__":
    main()
