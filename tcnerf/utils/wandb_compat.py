"""wandb-compatible experiment logging with a local JSONL fallback.

The reference logs epochs/pose errors to Weights & Biases with resumable runs
(src/utils/training.py:12-20, src/utils/util.py:51-71). wandb is not in this
image and the environment has no egress, so `init` transparently falls back to
a local recorder that appends metrics to `<dir>/wandb_log.jsonl` — same call
surface (`wandb.init(**cfg, resume=True)`, `wandb.log(dict)`, `run.finish()`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class _LocalRun:
    def __init__(self, log_dir: str, config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "wandb_log.jsonl")
        self.config = config or {}
        with open(os.path.join(log_dir, "wandb_config.json"), "w") as f:
            json.dump({k: str(v) for k, v in self.config.items()}, f)

    def log(self, metrics: dict):
        record = {"_time": time.time()}
        record.update({k: float(v) if hasattr(v, "__float__") else v
                       for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def finish(self):
        pass


class UsageError(Exception):
    pass


_active_run: Optional[_LocalRun] = None


def init(project: str = "tcnerf", dir: str = ".", config: Optional[dict] = None,
         resume: bool = True, **kwargs) -> _LocalRun:
    global _active_run
    try:
        import wandb as real_wandb  # pragma: no cover
        return real_wandb.init(project=project, dir=dir, config=config,
                               resume=resume, **kwargs)
    except ImportError:
        pass
    _active_run = _LocalRun(os.path.join(dir, "wandb_local", project), config)
    return _active_run


def log(metrics: dict):
    if _active_run is not None:
        _active_run.log(metrics)


def init_wandb(wandb_config: dict):
    """Reference init_wandb surface (src/utils/training.py:12-20)."""
    try:
        run = init(**wandb_config)
        return run, True
    except UsageError:
        return None, False
