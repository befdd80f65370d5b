"""Dataset loaders — API parity with the missing `dataset.utils` module.

Reference call sites: `load_dataset_nerf(n_perspectives, path)`
(src/train_nerf.py:92-95), `load_dataset_language` (src/train_language.py:29-32),
`load_dataset_baseline(path=..., n_perspectives=..., dataset_type=...)`
(src/train_goal.py:28) and `load_dataset(..., record_grasp_pose, record_order,
dataset_type=...)` (src/train_delta_ngf.py:32-39); see SURVEY.md §2.9.
"""

from __future__ import annotations

import os

import numpy as np
from typing import Optional

from .dataset import (ColorDataset, NPZDataset, PickleDataset,
                      SynchronizedDatasets)


def _open(root: str, n_perspectives: Optional[int] = None,
          keys=("color", "camera_config")) -> SynchronizedDatasets:
    datasets = {}
    for key in keys:
        directory = os.path.join(root, key)
        if key == "color":
            datasets[key] = ColorDataset(directory, n_perspectives)
        elif key in ("camera_config", "language", "info", "trajectory"):
            datasets[key] = PickleDataset(directory)
        elif key in ("grasp_pose", "order"):
            # language-style datasets store dict records -> pickle; plain 4x4 -> npz
            pkl = PickleDataset(directory)
            datasets[key] = pkl if len(pkl) > 0 else NPZDataset(directory)
        else:
            datasets[key] = NPZDataset(directory)
    return SynchronizedDatasets(datasets)


def load_dataset_nerf(n_perspectives: int, path: str) -> SynchronizedDatasets:
    return _open(path, n_perspectives, keys=("color", "camera_config"))


def load_dataset_language(n_perspectives: int, path: str) -> SynchronizedDatasets:
    return _open(path, n_perspectives,
                 keys=("color", "camera_config", "grasp_pose", "trajectory",
                       "language", "info"))


def load_dataset_baseline(path: str, n_perspectives: int,
                          dataset_type: str = "train") -> SynchronizedDatasets:
    return _open(os.path.join(path, dataset_type), n_perspectives,
                 keys=("color", "camera_config", "grasp_pose", "info"))


def load_dataset(path: str, n_perspectives: int, record_grasp_pose: bool = False,
                 record_order: bool = False,
                 dataset_type: str = "train") -> SynchronizedDatasets:
    keys = ["color", "camera_config", "trajectory", "info"]
    if record_grasp_pose:
        keys.append("grasp_pose")
    if record_order:
        keys.append("order")
    return _open(os.path.join(path, dataset_type), n_perspectives, keys=tuple(keys))


def ensure_dataset(path: str, n_perspectives: int, kind: str = "nerf",
                   n_samples: int = 8, image_size=(480, 640), rng=0,
                   n_spheres: int = 4, azimuth_span_deg=None,
                   **ring_kwargs) -> None:
    """Synthesize a dataset in place if `path` holds no samples.

    The reference's datasets live in git submodules that are not shipped
    (SURVEY.md §2.9); tcnerf substitutes deterministic synthetic scenes
    (tcnerf.data.synthetic) so every entry point runs out of the box.
    """
    import os

    from .synthetic import write_synthetic_dataset

    color_dir = os.path.join(path, "color")
    if os.path.isdir(color_dir) and any(
            f.startswith("sample_") for f in os.listdir(color_dir)):
        return
    if azimuth_span_deg is not None:
        ring_kwargs["azimuth_span"] = float(azimuth_span_deg) * np.pi / 180
    write_synthetic_dataset(
        path, n_samples=n_samples, n_perspectives=n_perspectives,
        height=image_size[0], width=image_size[1], rng=rng, n_spheres=n_spheres,
        dict_records=(kind == "language"), record_order=(kind == "grad"),
        **ring_kwargs)
