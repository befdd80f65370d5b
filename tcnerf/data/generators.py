"""Host-side batch generators (numpy) for the four training pipelines.

Behavior parity with reference src/lib/data_generator/ (base.py, mvnerf.py,
grasp_mvnerf.py, delta_ngf.py, language.py): per-epoch index shuffling,
view-sampling conventions, negative-pose synthesis and trajectory-window
augmentation. Divergences: an explicit np.random.Generator is threaded through
everything (the reference uses global RNG), and batches are plain numpy
pytrees ready for device prefetch (tcnerf.data.prefetch) instead of keras
Sequences.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from ..core.rays import bbox_biased_sample
from ..tasks.transform import Affine
from ..utils import native


def camera_parameters(camera_config):
    """3x3 intrinsics -> padded 4x4 K, inverse extrinsics.

    Reference: src/lib/data_generator/util.py:4-11.
    """
    intr = np.reshape(camera_config["intrinsics"], (3, 3))
    k4 = np.eye(4)
    k4[:3, :3] = intr
    ext_inv = np.linalg.inv(camera_config["pose"])
    return ext_inv, k4


class DataGenerator:
    """Index-shuffled epoch iteration (reference base.py:5-31)."""

    def __init__(self, dataset, batch_size=3, shuffle=True, rng=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = (np.random.default_rng(rng)
                    if not isinstance(rng, np.random.Generator) else rng)
        self.indices = self.get_valid_indices()
        self.on_epoch_end()

    def get_valid_indices(self):
        return np.arange(len(self.dataset))

    def on_epoch_end(self):
        if self.shuffle:
            self.rng.shuffle(self.indices)

    def __len__(self):
        return len(self.indices) // self.batch_size

    def __getitem__(self, index):
        batch = self.indices[index * self.batch_size:(index + 1) * self.batch_size]
        return self.get_data(batch)

    def epoch(self):
        for i in range(len(self)):
            yield self[i]
        self.on_epoch_end()

    def get_data(self, batch):
        raise NotImplementedError


class MVNeRFDataGenerator(DataGenerator):
    """Ray batches for NeRF pretraining (reference mvnerf.py:10-100)."""

    def __init__(self, dataset, n_rays_train=512, batch_size=1, n_views=2,
                 exclude_perspectives=(), **kwargs):
        super().__init__(dataset, batch_size, **kwargs)
        self.n_rays_train = n_rays_train
        self.n_views = n_views
        self.n_perspectives = self.dataset.datasets["color"].n_perspectives
        # perspectives the generator must never draw (source or target) —
        # lets per-scene runs (field=hashgrid) hold out a validation VIEW of
        # the training scene instead of a separate validation scene
        self.perspective_pool = np.setdiff1d(
            np.arange(self.n_perspectives), np.asarray(exclude_perspectives,
                                                       dtype=np.int64))

    def generate_rays(self, color, camera_config):
        intr3 = np.reshape(camera_config["intrinsics"], (3, 3)).astype(np.float32)
        pix = bbox_biased_sample(self.rng, self.n_rays_train,
                                 np.array([0, 0, color.shape[0], color.shape[1]]),
                                 color.shape[0], color.shape[1])
        u, v = pix[:, 1], pix[:, 0]
        r_o, r_d = native.rays_from_pixels(u, v, camera_config["pose"], intr3)
        return r_d, r_o, pix

    @staticmethod
    def get_input(colors, camera_configs, r_d, r_o):
        ext_invs, intrs = [], []
        for cfg in camera_configs:
            ext_inv, k4 = camera_parameters(cfg)
            ext_invs.append(ext_inv)
            intrs.append(k4)
        # stack u8 then scale IN f32: `np.array(colors)/255.0` would promote
        # the whole [V, H, W, 3] image stack through float64 (2x the memory
        # traffic of the largest tensor in the batch) before the f32 cast
        imgs = np.stack(colors).astype(np.float32)
        imgs *= np.float32(1.0 / 255.0)
        return (
            np.array([r_o], dtype=np.float32),
            np.array([r_d], dtype=np.float32),
            imgs[None],
            np.array([intrs], dtype=np.float32),
            np.array([ext_invs], dtype=np.float32),
        )

    @staticmethod
    def get_target(color, pix):
        return native.gather_target_rgb(color, np.asarray(pix, np.int32))

    def get_data(self, batch):
        ray_os, ray_ds, srcs, intrs, exts, targets = [], [], [], [], [], []
        for i in batch:
            indices = self.rng.choice(self.perspective_pool,
                                      size=self.n_views + 1, replace=False)
            src_indices, tgt_index = indices[:-1], indices[-1]
            tgt_color = self.dataset.datasets["color"].read_sample_at_idx(
                i, tgt_index)[..., :3]
            tgt_cfg = self.dataset.datasets["camera_config"].read_sample_at_idx(
                i, tgt_index)
            r_d, r_o, pix = self.generate_rays(tgt_color, tgt_cfg)
            targets.append(self.get_target(tgt_color, pix))

            src_colors, src_cfgs = [], []
            for s in src_indices:
                src_colors.append(
                    self.dataset.datasets["color"].read_sample_at_idx(i, s)[..., :3])
                src_cfgs.append(
                    self.dataset.datasets["camera_config"].read_sample_at_idx(i, s))
            nn_input = self.get_input(src_colors, src_cfgs, r_d, r_o)
            ray_os.extend(nn_input[0])
            ray_ds.extend(nn_input[1])
            srcs.extend(nn_input[2])
            intrs.extend(nn_input[3])
            exts.extend(nn_input[4])
        inputs = (
            np.array(ray_os, dtype=np.float32),
            np.array(ray_ds, dtype=np.float32),
            np.array(srcs, dtype=np.float32),
            np.array(intrs, dtype=np.float32),
            np.array(exts, dtype=np.float32),
        )
        return inputs, np.array(targets, dtype=np.float32)


def _grasp_view_indices(rng, n_views: int, n_perspectives: int):
    """View-index convention: 1-view samples from {3,4}, 3-view from {0,1,2}
    (reference grasp_mvnerf.py:26-29); otherwise any perspective."""
    if n_views == 1 and n_perspectives >= 5:
        return rng.choice(np.arange(3, 5), size=1, replace=False)
    if n_views == 3 and n_perspectives >= 3:
        return rng.choice(np.arange(0, 3), size=3, replace=False)
    return rng.choice(n_perspectives, size=n_views, replace=False)


class GraspMVNeRFDataGenerator(DataGenerator):
    """512-pose EBM batches: 1 positive + uniform + rotational negatives
    (reference grasp_mvnerf.py:9-63)."""

    def __init__(self, dataset, workspace_bounds, n_views=1, n_points_train=512,
                 batch_size=1, n_r_fraction=4, **kwargs):
        super().__init__(dataset, batch_size, **kwargs)
        self.n_points_train = n_points_train
        self.n_negative = ((n_r_fraction - 1) * n_points_train) // n_r_fraction
        self.n_r_negative = n_points_train - self.n_negative - 1
        self.workspace_bounds = workspace_bounds
        self.n_views = n_views
        self.n_perspectives = self.dataset.datasets["color"].n_perspectives

    def _camera_views(self, i, src_indices):
        colors, intrs, ext_invs = [], [], []
        for s in src_indices:
            colors.append(
                native.u8_to_f32_rgb(
                    self.dataset.datasets["color"].read_sample_at_idx(i, s)))
            cfg = self.dataset.datasets["camera_config"].read_sample_at_idx(i, s)
            ext_inv, k4 = camera_parameters(cfg)
            ext_invs.append(ext_inv)
            intrs.append(k4)
        return colors, intrs, ext_invs

    def get_data(self, batch):
        poses, targets = [], []
        srcs, intrs, exts = [], [], []
        for i in batch:
            src_indices = _grasp_view_indices(self.rng, self.n_views,
                                              self.n_perspectives)
            colors, k4s, ext_invs = self._camera_views(i, src_indices)
            pose = _read_grasp_pose(self.dataset, i)
            negatives = [Affine.random(self.workspace_bounds, rng=self.rng).matrix
                         for _ in range(self.n_negative)]
            r_negatives = [
                pose @ Affine.random(
                    t_bounds=((-0.01, 0.01),) * 3, allow_zero_rotation=False,
                    rng=self.rng).matrix
                for _ in range(self.n_r_negative)
            ]
            poses.append([pose, *negatives, *r_negatives])
            targets.append(np.concatenate(
                [np.ones(1), np.zeros(self.n_points_train - 1)], axis=0))
            srcs.append(colors)
            intrs.append(k4s)
            exts.append(ext_invs)
        inputs = [
            np.array(poses, dtype=np.float32),
            np.array(srcs, dtype=np.float32),
            np.array(intrs, dtype=np.float32),
            np.array(exts, dtype=np.float32),
        ]
        return inputs, np.array(targets, dtype=np.float32)


def _read_grasp_pose(dataset, i):
    record = dataset.datasets["grasp_pose"].read_sample(i)
    if isinstance(record, dict):
        record = record["grasp_pose"]
    return np.asarray(record)


def _read_trajectory(dataset, i):
    record = dataset.datasets["trajectory"].read_sample(i)
    if isinstance(record, dict):
        record = record["trajectory"]
    return record


def _pose_rotation(pose_m, rotation_representation: str):
    a = Affine.from_matrix(pose_m)
    if rotation_representation == "quaternion":
        return a.quat
    if rotation_representation == "6d":
        return np.concatenate([a.rotation[:, 0], a.rotation[:, 1]])
    raise ValueError(rotation_representation)


class DeltaNGFDataGenerator(DataGenerator):
    """Camera views + landscape poses + gradient-supervision windows
    (reference delta_ngf.py:9-205)."""

    def __init__(self, dataset, workspace_bounds, n_views=1, batch_size=1,
                 pose_augmentation_factor=1, n_future_poses=5,
                 fixed_orientation=None, rotation_representation="quaternion",
                 **kwargs):
        self.future_poses = n_future_poses
        self.pose_augmentation_factor = pose_augmentation_factor
        super().__init__(dataset, batch_size, **kwargs)
        self.workspace_bounds = workspace_bounds
        self.n_views = n_views
        self.n_perspectives = self.dataset.datasets["color"].n_perspectives
        self.fixed_orientation = fixed_orientation
        self.rotation_representation = rotation_representation

        self.n_points_train = self.future_poses * self.pose_augmentation_factor
        if self.fixed_orientation is not None:
            self.n_negative = self.n_points_train - self.future_poses
            self.n_r_negative = 0
        else:
            n_r_fraction = 8
            self.n_negative = ((n_r_fraction - 1) * self.n_points_train
                               ) // n_r_fraction - self.future_poses
            self.n_r_negative = (self.n_points_train - self.n_negative
                                 - self.future_poses)

    def get_data_camera(self, batch):
        srcs, intrs, exts = [], [], []
        for i in batch:
            src_indices = self.rng.choice(self.n_perspectives, size=self.n_views,
                                          replace=False)
            colors, k4s, ext_invs = [], [], []
            for s in src_indices:
                colors.append(native.u8_to_f32_rgb(
                    self.dataset.datasets["color"].read_sample_at_idx(i, s)))
                cfg = self.dataset.datasets["camera_config"].read_sample_at_idx(i, s)
                ext_inv, k4 = camera_parameters(cfg)
                ext_invs.append(ext_inv)
                k4s.append(k4)
            srcs.append(colors)
            intrs.append(k4s)
            exts.append(ext_invs)
        return (np.array(srcs, dtype=np.float32), np.array(intrs, dtype=np.float32),
                np.array(exts, dtype=np.float32))

    def get_data_landscape_final(self, batch):
        trans, rots, targets = [], [], []
        for i in batch:
            target_pose = _read_grasp_pose(self.dataset, i)
            negatives = [
                Affine.random(self.workspace_bounds, rng=self.rng).matrix
                for _ in range(self.n_negative + self.future_poses - 1)
            ]
            r_negatives = [
                target_pose @ Affine.random(
                    t_bounds=((-0.01, 0.01),) * 3, allow_zero_rotation=False,
                    rng=self.rng).matrix
                for _ in range(self.n_r_negative)
            ]
            all_poses = [target_pose, *negatives, *r_negatives]
            trans.append([Affine.from_matrix(p).translation for p in all_poses])
            rots.append([_pose_rotation(p, self.rotation_representation)
                         for p in all_poses])
            targets.append(np.concatenate(
                [np.ones(1), np.zeros(self.n_points_train - 1)], axis=0))
        return (np.array(trans, dtype=np.float32), np.array(rots, dtype=np.float32),
                np.array(targets, dtype=np.float32))

    def get_data_grad(self, batch):
        trans, rots, d_t, d_r = [], [], [], []
        for i in batch:
            trajectory = _read_trajectory(self.dataset, i)
            initial = self.rng.integers(0, len(trajectory) - self.future_poses - 1)
            window = trajectory[initial:initial + self.future_poses + 1]

            aug_poses, aug_targets = [], []
            for j, pose in enumerate(window[:-1]):
                for _ in range(self.pose_augmentation_factor):
                    aug = Affine.random(t_bounds=((-0.02, 0.02),) * 3,
                                        r_bounds=((-0.6, 0.6),) * 3, rng=self.rng)
                    input_pose = pose @ aug.matrix
                    target_pose = window[j + 1]
                    if self.fixed_orientation is not None:
                        input_pose = Affine(
                            translation=Affine.from_matrix(input_pose).translation,
                            rotation=self.fixed_orientation).matrix
                        target_pose = Affine(
                            translation=Affine.from_matrix(target_pose).translation,
                            rotation=self.fixed_orientation).matrix
                    aug_poses.append(input_pose)
                    aug_targets.append(target_pose)

            in_t = [Affine.from_matrix(p).translation for p in aug_poses]
            tg_t = [Affine.from_matrix(p).translation for p in aug_targets]
            in_r = [_pose_rotation(p, self.rotation_representation) for p in aug_poses]
            tg_r = [_pose_rotation(p, self.rotation_representation) for p in aug_targets]
            trans.append(in_t)
            rots.append(in_r)
            d_t.append([t - s for t, s in zip(tg_t, in_t)])
            d_r.append([t - s for t, s in zip(tg_r, in_r)])
        return (np.array(trans, dtype=np.float32), np.array(rots, dtype=np.float32),
                np.array(d_t, dtype=np.float32), np.array(d_r, dtype=np.float32))

    def get_data(self, batch):
        srcs, intrs, exts = self.get_data_camera(batch)
        l_t, l_r, targets = self.get_data_landscape_final(batch)
        g_t, g_r, d_t, d_r = self.get_data_grad(batch)
        inputs = [l_t, l_r, g_t, g_r, srcs, intrs, exts]
        return inputs, [targets, d_t, d_r]


class LanguageDataGenerator(DeltaNGFDataGenerator):
    """DeltaNGF batches + CLIP-tokenized instructions (reference language.py)."""

    def __init__(self, dataset, workspace_bounds, tokenize_fn: Optional[Callable] = None,
                 **kwargs):
        super().__init__(dataset, workspace_bounds, **kwargs)
        if tokenize_fn is None:
            from ..clip.tokenizer import tokenize as tokenize_fn
        self.tokenize_fn = tokenize_fn

    def get_data_text(self, batch):
        texts = [self.dataset.datasets["language"].read_sample(i) for i in batch]
        return np.array(self.tokenize_fn(texts), dtype=np.int32)

    def get_data(self, batch):
        inputs, targets = super().get_data(batch)
        inputs.append(self.get_data_text(batch))
        return inputs, targets
