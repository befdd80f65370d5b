"""Oracle agent — pose-error computation for validation.

Re-implementation of the missing `agents` submodule API (SURVEY.md §2.10):
`OracleAgent.calculate_error(gt_pose, pose)` where each pose is
[(tx, ty, tz), (qx, qy, qz, qw)], returning (translational_error_m,
rotational_error_rad). Used by the validation loop
(reference src/utils/optimization.py:108-133).
"""

from __future__ import annotations

import numpy as np


class OracleAgent:
    def calculate_error(self, gt_pose, pose):
        t_gt = np.asarray(gt_pose[0], dtype=np.float64)
        t = np.asarray(pose[0], dtype=np.float64)
        q_gt = np.asarray(gt_pose[1], dtype=np.float64)
        q = np.asarray(pose[1], dtype=np.float64)
        q_gt = q_gt / np.linalg.norm(q_gt)
        q = q / np.linalg.norm(q)
        translational = float(np.linalg.norm(t_gt - t))
        dot = np.clip(np.abs(np.dot(q_gt, q)), 0.0, 1.0)
        rotational = float(2.0 * np.arccos(dot))
        return translational, rotational


def setup_oracle(plugins_cfg=None, oracle_cfg=None):
    """Plugin-based oracle construction (reference flat `setup_oracle`,
    src/train_goal.py:90): load task plugins, create the configured oracle."""
    from . import loader, factory

    if plugins_cfg:
        if isinstance(plugins_cfg, dict):
            plugins_cfg = plugins_cfg.get("plugins", [])
        loader.load_plugins(list(plugins_cfg))
    if oracle_cfg:
        cfg = {k: (v.to_dict() if hasattr(v, "to_dict") else v)
               for k, v in dict(oracle_cfg).items()}
        return factory.create_oracle(cfg)
    return OracleAgent()
