"""Tests for the dataset layer, generators, config system, and task framework
(all host-side numpy — no jit compiles)."""

import json
import os

import numpy as np
import pytest

from tcnerf.data import dataset as ds
from tcnerf.data.generators import (DeltaNGFDataGenerator,
                                    GraspMVNeRFDataGenerator,
                                    LanguageDataGenerator, MVNeRFDataGenerator,
                                    camera_parameters)
from tcnerf.data.loaders import (ensure_dataset, load_dataset,
                                 load_dataset_baseline, load_dataset_language,
                                 load_dataset_nerf)
from tcnerf.data.synthetic import write_synthetic_dataset
from tcnerf.tasks import factory, loader
from tcnerf.tasks.transform import Affine
from tcnerf.train.config import load_config

H, W = 32, 40
WORKSPACE = [[0.35, 0.85], [-0.25, 0.25], [0.0, 0.2]]
CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "tcnerf", "configs")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    write_synthetic_dataset(str(root / "plain"), n_samples=3, n_perspectives=5,
                            height=H, width=W, rng=0)
    write_synthetic_dataset(str(root / "lang"), n_samples=3, n_perspectives=5,
                            height=H, width=W, rng=1, dict_records=True)
    return root


class TestDatasets:
    def test_color_and_camera(self, synth_root):
        d = load_dataset_nerf(5, str(synth_root / "plain"))
        assert len(d) == 3
        img = d.datasets["color"].read_sample_at_idx(0, 2)
        assert img.shape == (H, W, 4) and img.dtype == np.uint8
        cfg = d.datasets["camera_config"].read_sample_at_idx(0, 2)
        assert cfg["pose"].shape == (4, 4)
        assert np.reshape(cfg["intrinsics"], (3, 3)).shape == (3, 3)

    def test_grasp_and_trajectory_records(self, synth_root):
        d = load_dataset(str(synth_root / "plain") + "/..", 5,
                         record_grasp_pose=True, dataset_type="plain")
        pose = d.datasets["grasp_pose"].read_sample(1)
        assert pose.shape == (4, 4)
        traj = d.datasets["trajectory"].read_sample(1)
        assert len(traj) == 10 and traj[0].shape == (4, 4)
        # trajectory descends to the grasp pose
        np.testing.assert_allclose(traj[-1], pose, atol=1e-12)
        assert traj[0][2, 3] > pose[2, 3]

    def test_language_records(self, synth_root):
        d = load_dataset_language(5, str(synth_root / "lang"))
        rec = d.datasets["grasp_pose"].read_sample(0)
        assert isinstance(rec, dict) and rec["grasp_pose"].shape == (4, 4)
        text = d.datasets["language"].read_sample(0)
        assert text.startswith("grasp the ")
        info = d.datasets["info"].read_sample(0)
        assert any(v.get("is_target") for v in info.values())

    def test_mnpz_roundtrip(self, tmp_path):
        path = str(tmp_path / "mono.npz")
        ds.MNPZDataset.write(path, {"a": np.arange(12).reshape(3, 4)})
        m = ds.MNPZDataset(path, key="a")
        assert len(m) == 3
        np.testing.assert_array_equal(m.read_sample(1), [4, 5, 6, 7])

    def test_ensure_dataset_idempotent(self, tmp_path):
        p = str(tmp_path / "auto")
        ensure_dataset(p, 4, "nerf", n_samples=2, image_size=(H, W))
        first = sorted(os.listdir(os.path.join(p, "color")))
        ensure_dataset(p, 4, "nerf", n_samples=5, image_size=(H, W))
        assert sorted(os.listdir(os.path.join(p, "color"))) == first


class TestGenerators:
    def test_mvnerf_batch_shapes(self, synth_root):
        d = load_dataset_nerf(5, str(synth_root / "plain"))
        g = MVNeRFDataGenerator(d, n_rays_train=32, batch_size=2, n_views=2,
                                rng=0)
        inputs, targets = g[0]
        ro, rd, imgs, intr, ext = inputs
        assert ro.shape == (2, 32, 3) and rd.shape == (2, 32, 3)
        assert imgs.shape == (2, 2, H, W, 3)
        assert intr.shape == (2, 2, 4, 4) and ext.shape == (2, 2, 4, 4)
        assert targets.shape == (2, 32, 3)
        assert 0 <= targets.min() and targets.max() <= 1
        np.testing.assert_allclose(np.linalg.norm(np.asarray(rd), axis=-1),
                                   1.0, atol=1e-5)

    def test_grasp_batch_positive_first(self, synth_root):
        d = load_dataset_baseline(str(synth_root), 5, dataset_type="plain")
        g = GraspMVNeRFDataGenerator(d, WORKSPACE, n_views=1, n_points_train=16,
                                     batch_size=1, n_r_fraction=4, rng=0)
        inputs, labels = g[0]
        poses, imgs, intr, ext = inputs
        assert poses.shape == (1, 16, 4, 4)
        assert labels.shape == (1, 16)
        assert labels[0, 0] == 1 and labels[0, 1:].sum() == 0
        # positive pose equals the dataset grasp pose
        i = g.indices[0]
        gt = d.datasets["grasp_pose"].read_sample(i)
        np.testing.assert_allclose(poses[0, 0], gt, atol=1e-6)

    def test_delta_ngf_batch(self, synth_root):
        d = load_dataset(str(synth_root), 5, record_grasp_pose=True,
                         dataset_type="plain")
        g = DeltaNGFDataGenerator(d, WORKSPACE, n_views=1, batch_size=1,
                                  pose_augmentation_factor=4, n_future_poses=4,
                                  rotation_representation="quaternion", rng=0)
        inputs, targets = g[0]
        l_t, l_r, g_t, g_r, imgs, intr, ext = inputs
        n_pts = 16
        assert l_t.shape == (1, n_pts, 3) and l_r.shape == (1, n_pts, 4)
        assert g_t.shape == (1, n_pts, 3) and g_r.shape == (1, n_pts, 4)
        assert targets[0].shape == (1, n_pts)
        assert targets[1].shape == (1, n_pts, 3)
        assert targets[2].shape == (1, n_pts, 4)

    def test_delta_ngf_6d(self, synth_root):
        d = load_dataset(str(synth_root), 5, record_grasp_pose=True,
                         dataset_type="plain")
        g = DeltaNGFDataGenerator(d, WORKSPACE, n_views=1, batch_size=1,
                                  pose_augmentation_factor=4, n_future_poses=4,
                                  rotation_representation="6d", rng=0)
        inputs, targets = g[0]
        assert inputs[1].shape[-1] == 6
        assert targets[2].shape[-1] == 6
        # 6d rows are unit-norm column pairs
        np.testing.assert_allclose(
            np.linalg.norm(inputs[1][..., :3], axis=-1), 1.0, atol=1e-5)

    def test_language_generator_tokens(self, synth_root):
        d = load_dataset_language(5, str(synth_root / "lang"))
        g = LanguageDataGenerator(d, WORKSPACE, n_views=1, batch_size=2,
                                  pose_augmentation_factor=2, n_future_poses=4,
                                  rng=0)
        inputs, targets = g[0]
        tokens = inputs[7]
        assert tokens.shape == (2, 77) and tokens.dtype == np.int32
        assert (tokens[:, 0] == 49406).all()  # SOT

    def test_epoch_shuffling_deterministic(self, synth_root):
        d = load_dataset_nerf(5, str(synth_root / "plain"))
        g1 = MVNeRFDataGenerator(d, n_rays_train=8, batch_size=1, n_views=1, rng=7)
        g2 = MVNeRFDataGenerator(d, n_rays_train=8, batch_size=1, n_views=1, rng=7)
        (i1, t1), (i2, t2) = g1[0], g2[0]
        np.testing.assert_array_equal(t1, t2)


class TestConfig:
    def test_composition_and_interpolation(self):
        cfg = load_config(CONFIG_DIR, "nerf_1_view", ["data_dir=/tmp/dd"])
        assert cfg.nerf_model.n_views == 1
        assert cfg.nerf_model.n_samples == 64
        assert cfg.dataset.path.startswith("/tmp/dd/")

    def test_override_group(self):
        cfg = load_config(CONFIG_DIR, "language_1_view")
        assert cfg.grasp_model.rotation_representation == "6d"
        assert cfg.validation.grasp_opt_config.optimizer_config.n_images == 3

    def test_all_root_configs_compose(self):
        for name in ["nerf_1_view", "nerf_1_view_wo", "nerf_3_view",
                     "goal_1_view", "language_1_view", "trajectory_1_view-1",
                     "trajectory_1_view-2", "dngf_1_view"]:
            cfg = load_config(CONFIG_DIR, name)
            assert "nerf_model" in cfg, name

    def test_grasp_model_follows_config_shape(self):
        """Regression: build_grasp_model must thread n_blocks/hidden_size so
        a reduced-scale goal model matches its reduced-scale nerf backbone
        (the goal_convergence_cpu run failed checkpoint load without this)."""
        from tcnerf.train.grasp_common import build_grasp_model

        cfg = load_config(CONFIG_DIR, "goal_convergence_cpu",
                          ["data_dir=/tmp/dd", "ws_dir=/tmp/dd"])
        model = build_grasp_model(cfg)
        assert model.n_blocks == cfg.nerf_model.n_blocks == 4
        assert model.hidden_size == cfg.nerf_model.hidden_size == 64


class TestTaskFramework:
    def test_affine_algebra(self):
        a1 = Affine(translation=(1, 1, 0), rotation=[0, 0, np.pi / 2])
        a3 = Affine(translation=(2, 0, 0))
        np.testing.assert_allclose((a1 * a3).translation, [1, 3, 0], atol=1e-12)
        np.testing.assert_allclose((a1 * a1.invert()).matrix, np.eye(4),
                                   atol=1e-12)
        assert len(a1.interpolate_to(a3, 0.1)) >= 2
        r = Affine.random(t_bounds=((0, 1),) * 3, rng=3)
        assert (r.translation >= 0).all() and (r.translation <= 1).all()

    def test_factory_registry_and_oracle(self, tmp_path):
        loader.load_plugins(["objects", "pick_and_place", "grasp_task",
                             "suction_grasp"])
        cfg = {"offset": {"translation": [0, 0, 0.02]}, "min_dist": 0.05,
               "pick_config": [{"type": "segment", "point_a": [-0.02, 0, 0],
                                "point_b": [0.02, 0, 0]}]}
        with open(tmp_path / "pick_object_config.json", "w") as f:
            json.dump(cfg, f)
        factory.register_available_object("box", str(tmp_path))
        tf = factory.create_task_factory({
            "task_factory_type": "grasp-task-factory",
            "t_bounds": ((0.3, 0.7), (-0.25, 0.25), (0, 0)),
            "r_bounds": ((0, 0), (0, 0), (0, 6.28)),
            "object_types": ["box"], "n_objects": 3,
            "manipulation_type": "pick_object",
            "primitive_type": "pick-primitive", "rng": 0})
        task = tf.create_task()
        assert len(task.manipulation_objects) == 3
        # objects don't overlap
        for i, a in enumerate(task.manipulation_objects):
            for b in task.manipulation_objects[i + 1:]:
                d = np.linalg.norm(a.pose.translation[:2]
                                   - b.pose.translation[:2])
                assert d >= a.min_dist + b.min_dist - 1e-9
        oracle = factory.create_oracle({
            "oracle_type": "suction_grasp-oracle",
            "gripper_offset": {"rotation": [np.pi, 0, np.pi / 2]}, "rng": 0})
        action, solved = oracle.solve(task)
        errors = oracle.compute_attention_errors(task, action[0])
        assert errors[0][0] < 1e-6
        oracle.execute(action, task)
        assert len(task.manipulation_objects) == 2
        assert not solved

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError, match="unknown oracle type"):
            factory.create_oracle({"oracle_type": "nope"})

    def test_rectangle_pose_errors(self):
        """Rectangle grasp areas: plane projection + triangle-area containment
        (reference plugins/objects/base.py:125-187, geometric_utils.py:4-12).
        Hand-computed cases."""
        from tcnerf.tasks.plugins.objects.base import PickObject

        rect = {"type": "rectangle",
                "point_a": [-0.1, -0.05, 0.0], "point_b": [0.1, -0.05, 0.0],
                "point_c": [0.1, 0.05, 0.0], "point_d": [-0.1, 0.05, 0.0]}
        obj = PickObject(pick_config=[rect])

        # inside the rectangle: t_error = |plane distance|, upright => r=0
        (t, r), = obj.compute_pose_errors(
            Affine(translation=[0.0, 0.0, 0.02]))
        assert abs(t - 0.02) < 1e-9 and abs(r) < 1e-9

        # outside: min 3D distance to the four edges; 30deg x-tilt => r=pi/6
        g = Affine(translation=[0.2, 0.0, 0.03],
                   rotation=[np.pi / 6, 0.0, 0.0])
        (t, r), = obj.compute_pose_errors(g)
        assert abs(t - np.sqrt(0.1 ** 2 + 0.03 ** 2)) < 1e-9
        assert abs(r - np.pi / 6) < 1e-9

        # object pose carries the rectangle; yaw about z keeps it horizontal
        obj2 = PickObject(pose=Affine(translation=[0.5, 0.2, 0.1],
                                      rotation=[0.0, 0.0, 0.7]),
                          pick_config=[rect])
        (t, r), = obj2.compute_pose_errors(
            Affine(translation=[0.5, 0.2, 0.15]))
        assert abs(t - 0.05) < 1e-9 and abs(r) < 1e-9

        # boundary containment tolerance: a point ON the edge counts inside
        (t, _), = obj.compute_pose_errors(
            Affine(translation=[0.1, 0.0, 0.04]))
        assert abs(t - 0.04) < 1e-9


class TestTokenizer:
    def test_shapes_and_framing(self):
        from tcnerf.clip.tokenizer import tokenize, SOT_TOKEN, EOT_TOKEN
        toks = tokenize(["grasp the red ball", "hello"])
        assert toks.shape == (2, 77)
        assert toks[0, 0] == SOT_TOKEN
        eot_pos = int(np.argmax(toks[0]))
        assert toks[0, eot_pos] == EOT_TOKEN
        assert (toks[0, eot_pos + 1:] == 0).all()

    def test_roundtrip_fallback_vocab(self):
        from tcnerf.clip.tokenizer import SimpleTokenizer
        tk = SimpleTokenizer()
        ids = tk.encode("pick up the blue cube")
        assert tk.decode(ids).strip() == "pick up the blue cube"

    def test_too_long_raises_or_truncates(self):
        from tcnerf.clip.tokenizer import tokenize
        text = "word " * 200
        with pytest.raises(RuntimeError):
            tokenize(text)
        toks = tokenize(text, truncate=True)
        assert toks.shape == (1, 77)


class TestNativeRuntime:
    def test_native_matches_numpy(self):
        from tcnerf.utils import native
        from tcnerf.core.rays import get_specific_rays

        intr = np.array([[90.0, 0, 20], [0, 90.0, 16], [0, 0, 1]])
        extr = np.eye(4)
        extr[:3, 3] = [0.5, -0.2, 1.0]
        u = np.arange(12, dtype=np.float32)
        v = u * 0.5
        ro_n, rd_n = native.rays_from_pixels(u, v, extr, intr)
        ro_p, rd_p = get_specific_rays(u, v, extr, intr)
        np.testing.assert_allclose(rd_n, rd_p, atol=1e-6)
        np.testing.assert_allclose(ro_n, ro_p, atol=1e-6)

    def test_u8_conversion_and_gather(self, rng):
        from tcnerf.utils import native

        img = rng.integers(0, 255, size=(6, 8, 4)).astype(np.uint8)
        np.testing.assert_allclose(native.u8_to_f32_rgb(img),
                                   img[..., :3] / 255.0, atol=1e-6)
        pix = np.array([[1, 2], [5, 7]], np.int32)
        np.testing.assert_allclose(native.gather_target_rgb(img, pix),
                                   img[pix[:, 0], pix[:, 1], :3] / 255.0,
                                   atol=1e-6)


class TestPrefetch:
    def test_prefetch_yields_all_batches_in_order(self, synth_root):
        import jax
        from tcnerf.data.loaders import load_dataset_nerf
        from tcnerf.data.prefetch import prefetch_to_device

        d = load_dataset_nerf(5, str(synth_root / "plain"))
        g = MVNeRFDataGenerator(d, n_rays_train=8, batch_size=1, n_views=1,
                                rng=1, shuffle=False)
        host = [g[i] for i in range(len(g))]
        got = list(prefetch_to_device(iter(host), size=2))
        assert len(got) == len(host)
        for (hi, ht), (di, dt) in zip(host, got):
            np.testing.assert_allclose(np.asarray(dt), ht, atol=0)

    def test_prefetch_propagates_errors(self):
        from tcnerf.data.prefetch import prefetch_to_device

        def bad():
            yield np.zeros(3)
            raise RuntimeError("boom")

        it = prefetch_to_device(bad(), size=1)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            list(it)


class TestSession:
    def test_progress_roundtrip(self, tmp_path):
        import json
        from tcnerf.train import session

        d = str(tmp_path)
        start, pf = session.init_training_session(d)
        assert start == 0
        with open(pf, "w") as f:
            json.dump({"epoch": 12, "best_mean_error": [0.01, 0.2]}, f)
        start2, _ = session.init_training_session(d)
        assert start2 == 12
        assert session.read_best_mean_error(pf) == [0.01, 0.2]

    def test_error_score_combines_mm_and_deg(self):
        from tcnerf.train import session

        # 10 mm + 90 deg
        score = session.error_score([0.01, np.pi / 2])
        assert abs(score - (10 + 90)) < 1e-9

    def test_get_step_results_top5(self):
        from tcnerf.train.session import get_step_results
        from tcnerf.tasks.transform import Affine

        gt = np.eye(4)
        poses = [Affine(translation=[0.001 * k, 0, 0]) for k in range(8)]
        losses = np.arange(8.0)  # best = last
        result = get_step_results(losses, poses, gt)
        assert len(result["grasp_poses"]) == 5
        # last entry is the highest-energy pose (k=7)
        np.testing.assert_allclose(result["grasp_poses"][-1].translation,
                                   [0.007, 0, 0], atol=1e-12)
        # its translational error is 7 mm
        assert abs(result["errors_r"][-1][0] - 0.007) < 1e-12

    def test_wandb_local_fallback(self, tmp_path):
        from tcnerf.utils import wandb_compat

        run, ok = wandb_compat.init_wandb(
            {"project": "t", "dir": str(tmp_path), "config": {"a": 1}})
        assert ok
        run.log({"epoch": 1, "loss": 0.5})
        log_file = tmp_path / "wandb_local" / "t" / "wandb_log.jsonl"
        assert log_file.exists()
        rec = json.loads(log_file.read_text().splitlines()[0])
        assert rec["loss"] == 0.5


class TestColorDatasetCache:
    def test_cached_reads_identical_and_immutable(self, tmp_path):
        """ColorDataset RAM-caches decoded samples (the NPZ decompression was
        73% of full-scale batch synthesis); cached reads must return the
        same data and be write-protected (they are shared across batches)."""
        from tcnerf.data.dataset import ColorDataset

        d = str(tmp_path / "color")
        rng = np.random.default_rng(0)
        sample = rng.integers(0, 255, (3, 8, 10, 4), dtype=np.uint8)
        ColorDataset.write_sample(d, 0, sample)
        ds = ColorDataset(d, n_perspectives=3)
        first = ds.read_sample(0)
        second = ds.read_sample(0)
        np.testing.assert_array_equal(first, sample)
        assert second is first          # cache hit, no re-decode
        assert not second.flags.writeable
        with pytest.raises(ValueError):
            second[0, 0, 0, 0] = 1
