"""Tests for the grasp-EBM stack: probe grid, energy forward, both train steps,
and pose optimization by energy ascent on a synthetic energy landscape."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcnerf.data.synthetic import SyntheticScene, generate_views
from tcnerf.data.generators import camera_parameters
from tcnerf.models.grasp import GraspEBM, probe_transforms
from tcnerf.models import grasp_training as GT
from tcnerf.opt.pose_optimizer import PoseOptimizer, compute_results
from tcnerf.tasks.agents import OracleAgent

H, W = 48, 64
TINY = dict(
    n_views=1, n_features=32, original_image_size=(H, W), n_5d_poses=3,
    n_blocks=2, hidden_size=32, vit_size=(32, 32), vit_patch=16, vit_dim=32,
    vit_heads=2, vit_hooks=(1, 2, 3, 4),
)
WORKSPACE = ((0.3, 0.7), (-0.25, 0.25), (0.0, 0.3))


@pytest.fixture(scope="module")
def grasp_setup():
    scene = SyntheticScene.random(0, n_spheres=2)
    colors, configs = generate_views(scene, 5, height=H, width=W,
                                     radius=1.0, polar=0.6)
    src = colors[3][..., :3] / 255.0
    ext_inv, k4 = camera_parameters(configs[3])
    src_images = jnp.asarray(src, jnp.float32)[None, None]
    src_intr = jnp.asarray(k4, jnp.float32)[None, None]
    src_ext = jnp.asarray(ext_inv, jnp.float32)[None, None]

    model = GraspEBM(**TINY)
    rng = np.random.default_rng(0)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 8)[None]
    poses[0, :, :3, 3] = rng.uniform(0.3, 0.5, size=(8, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(poses), src_images,
                        src_intr, src_ext)["params"]
    return model, params, (src_images, src_intr, src_ext), scene


class TestProbeGrid:
    def test_probe_count_and_offsets(self):
        p = probe_transforms(7)
        assert p.shape == (42, 4, 4)
        # the two tip probes at the center offset are pure translations
        np.testing.assert_allclose(p[3][:3, :3], np.eye(3), atol=1e-12)
        np.testing.assert_allclose(p[3][:3, 3], [0, 0.015, 0], atol=1e-12)
        # side-finger probes are rotated +-pi/2 about y
        assert abs(p[17][0, 2]) > 0.99 or abs(p[17][2, 0]) > 0.99

    def test_small_grid(self):
        assert probe_transforms(3).shape == (18, 4, 4)


class TestGraspForward:
    def test_energy_shape_and_finite(self, grasp_setup):
        model, params, (imgs, intr, ext), _ = grasp_setup
        poses = jnp.tile(jnp.eye(4), (1, 8, 1, 1)).astype(jnp.float32)
        e = model.apply({"params": params}, poses, imgs, intr, ext)
        assert e.shape == (1, 8)
        assert np.isfinite(np.asarray(e)).all()

    def test_energy_from_pose_params_grad(self, grasp_setup):
        model, params, (imgs, intr, ext), _ = grasp_setup
        feats = model.apply({"params": params}, imgs, method="encode")
        t = jnp.asarray(np.random.default_rng(1).uniform(
            0.3, 0.5, (1, 4, 3)).astype(np.float32))
        q = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (1, 4, 1))

        def e_sum(t, q):
            return jnp.sum(model.apply({"params": params}, t, q, imgs, intr, ext,
                                       feats, "quaternion",
                                       method="energy_from_pose_params"))

        g_t, g_q = jax.grad(e_sum, argnums=(0, 1))(t, q)
        assert np.isfinite(np.asarray(g_t)).all()
        assert np.abs(np.asarray(g_t)).max() > 0
        assert np.isfinite(np.asarray(g_q)).all()


class TestGraspTraining:
    def _batch(self, grasp_setup, n_points=16):
        model, params, (imgs, intr, ext), scene = grasp_setup
        rng = np.random.default_rng(2)
        target = scene.grasp_pose(0).astype(np.float32)
        negs = rng.uniform(size=(n_points - 1, 4, 4)).astype(np.float32)
        negs[:] = np.eye(4, dtype=np.float32)
        negs[:, :3, 3] = rng.uniform(0.3, 0.7, (n_points - 1, 3))
        poses = np.concatenate([target[None], negs])[None]
        labels = np.zeros((1, n_points), np.float32)
        labels[0, 0] = 1.0
        return [jnp.asarray(poses), imgs, intr, ext], jnp.asarray(labels)

    def test_ce_loss_decreases_and_backbone_frozen(self, grasp_setup):
        model, params, _, _ = grasp_setup
        inputs, labels = self._batch(grasp_setup)
        state = GT.create_grasp_train_state(model, params, learning_rate=3e-3)
        backbone_before = np.asarray(
            state.params["fine_embedding"]["layer_0"]["kernel"]).copy()
        losses = []
        for _ in range(25):
            state, m = GT.grasp_train_step(state, inputs, labels, "cross_entropy")
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses
        np.testing.assert_array_equal(
            np.asarray(state.params["fine_embedding"]["layer_0"]["kernel"]),
            backbone_before)

    def test_kl_mode_runs(self, grasp_setup):
        model, params, _, _ = grasp_setup
        inputs, labels = self._batch(grasp_setup)
        state = GT.create_grasp_train_state(model, params)
        state, m = GT.grasp_train_step(state, inputs, labels, "kl_divergence")
        assert np.isfinite(float(m["loss"]))

    def test_kl_sum_reduction_matches_reference_scale(self, grasp_setup):
        """loss_reduction='sum' reproduces the reference's implicit TF sum
        over the per-sample KL vector (train_goal.py:51 + model.py:167-168):
        sum = batch_size x mean for a [B, N] batch."""
        rng = np.random.default_rng(3)
        b, n = 4, 16
        labels = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(b, n)).astype(np.float32)))
        probs = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(b, n)).astype(np.float32)))
        mean = float(GT.kl_divergence(labels, probs))
        total = float(GT.kl_divergence(labels, probs, reduction="sum"))
        np.testing.assert_allclose(total, b * mean, rtol=1e-6)

        # and the train step accepts the knob
        model, params, _, _ = grasp_setup
        inputs, step_labels = self._batch(grasp_setup)
        state = GT.create_grasp_train_state(model, params)
        _, m_mean = GT.grasp_train_step(state, inputs, step_labels,
                                        "kl_divergence", "mean")
        _, m_sum = GT.grasp_train_step(state, inputs, step_labels,
                                       "kl_divergence", "sum")
        np.testing.assert_allclose(float(m_sum["loss"]),
                                   float(m_mean["loss"]), rtol=1e-5)


class TestDeltaNGFTraining:
    def test_second_order_step(self, grasp_setup):
        model, params, (imgs, intr, ext), scene = grasp_setup
        rng = np.random.default_rng(3)
        n_pts = 8
        l_t = rng.uniform(0.3, 0.7, (1, n_pts, 3)).astype(np.float32)
        l_r = np.tile([0, 0, 0, 1], (1, n_pts, 1)).astype(np.float32)
        g_t = rng.uniform(0.3, 0.7, (1, n_pts, 3)).astype(np.float32)
        g_r = np.tile([0, 0, 0, 1], (1, n_pts, 1)).astype(np.float32)
        labels = [
            jnp.asarray(np.eye(n_pts, dtype=np.float32)[:1]),
            jnp.asarray(rng.normal(size=(1, n_pts, 3)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(1, n_pts, 4)).astype(np.float32)),
        ]
        inputs = [jnp.asarray(l_t), jnp.asarray(l_r), jnp.asarray(g_t),
                  jnp.asarray(g_r), imgs, intr, ext]
        state = GT.create_grasp_train_state(model, params)
        readout_before = jax.tree_util.tree_map(
            np.asarray, state.params["grasp_readout"])
        state, m = GT.delta_ngf_train_step(state, inputs, labels,
                                           "cross_entropy", "quaternion")
        for k in ("landscape_loss", "grad_loss_t", "grad_loss_r", "pred"):
            assert np.isfinite(float(m[k])), (k, m)
        moved = np.abs(
            np.asarray(state.params["grasp_readout"]["readout_head"]
                       ["output_layer"]["kernel"])
            - readout_before["readout_head"]["output_layer"]["kernel"]).max()
        assert moved > 0

    def test_6d_rotation_mode(self, grasp_setup):
        model, params, (imgs, intr, ext), _ = grasp_setup
        rng = np.random.default_rng(4)
        n_pts = 4
        sixd = np.tile([1, 0, 0, 0, 1, 0], (1, n_pts, 1)).astype(np.float32)
        inputs = [
            jnp.asarray(rng.uniform(0.3, 0.7, (1, n_pts, 3)).astype(np.float32)),
            jnp.asarray(sixd),
            jnp.asarray(rng.uniform(0.3, 0.7, (1, n_pts, 3)).astype(np.float32)),
            jnp.asarray(sixd), imgs, intr, ext,
        ]
        labels = [
            jnp.asarray(np.eye(n_pts, dtype=np.float32)[:1]),
            jnp.asarray(rng.normal(size=(1, n_pts, 3)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(1, n_pts, 6)).astype(np.float32)),
        ]
        state = GT.create_grasp_train_state(model, params)
        state, m = GT.delta_ngf_train_step(state, inputs, labels,
                                           "cross_entropy", "6d")
        assert np.isfinite(float(m["grad_loss_r"]))


class TestPoseOptimizer:
    def test_ascent_increases_energy(self, grasp_setup):
        model, params, (imgs, intr, ext), _ = grasp_setup
        opt = PoseOptimizer(
            apply_fn=model.apply, params=params, workspace_bounds=WORKSPACE,
            n_initial_guesses=16, n_images=1, n_views=1,
            init_lr_t=0.01, decay_t=0.95, clip_translation=True)
        feats = model.apply({"params": params}, imgs, method="encode")
        guesses = opt.generate_initial_guesses(rng=0)
        state = opt.init_state(guesses)
        inputs = (imgs, intr, ext)
        e0 = np.asarray(opt.compute_current_grasp_success(state, inputs, feats))
        # enough steps that systematic ascent dominates the bf16 execution
        # noise of the tunneled-TPU test box (gradient cosine corner-vs-
        # scattered is 0.998; per-step energy deltas are ~1e-3)
        state, trace = opt.optimize_pose(state, inputs, feats, (True, True), 24)
        e1 = np.asarray(opt.compute_current_grasp_success(state, inputs, feats))
        assert trace.shape == (24, 16)
        assert e1.mean() > e0.mean()  # ascent increases energy
        # quaternions stay normalized (projection step)
        norms = np.linalg.norm(np.asarray(state.rotations), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        # translations clipped to workspace
        t = np.asarray(state.translations)[0]
        ws = np.asarray(WORKSPACE)
        assert (t >= ws[:, 0] - 1e-6).all() and (t <= ws[:, 1] + 1e-6).all()

    def test_compute_results_alternating(self, grasp_setup):
        model, params, (imgs, intr, ext), _ = grasp_setup
        opt = PoseOptimizer(
            apply_fn=model.apply, params=params, workspace_bounds=WORKSPACE,
            n_initial_guesses=8, n_images=1, n_views=1)
        feats = model.apply({"params": params}, imgs, method="encode")
        losses_t, losses_r, grasps_t, grasps_r, duration, traj = compute_results(
            opt, (imgs, intr, ext), feats, init_poses=None,
            n_optimization_steps=2, init_lr_t=0.02, decay_t=0.9, sync=False, rng=1)
        assert len(grasps_r) == 8
        assert losses_r.shape == (8,)
        assert duration > 0


class TestOracle:
    def test_error_zero_for_identical(self):
        o = OracleAgent()
        e_t, e_r = o.calculate_error(
            [(0.1, 0.2, 0.3), (0, 0, 0, 1)], [(0.1, 0.2, 0.3), (0, 0, 0, 1)])
        assert e_t == 0 and abs(e_r) < 1e-6

    def test_error_known_values(self):
        o = OracleAgent()
        # 90 deg about z: q = (0, 0, sin45, cos45)
        s = np.sin(np.pi / 4)
        e_t, e_r = o.calculate_error(
            [(0, 0, 0), (0, 0, 0, 1)], [(1, 0, 0), (0, 0, s, s)])
        assert abs(e_t - 1.0) < 1e-9
        assert abs(e_r - np.pi / 2) < 1e-6

    def test_quaternion_double_cover(self):
        o = OracleAgent()
        _, e_r = o.calculate_error(
            [(0, 0, 0), (0, 0, 0, 1)], [(0, 0, 0), (0, 0, 0, -1)])
        assert abs(e_r) < 1e-6


class TestGraspCornerGatherParity:
    def test_corner_path_matches_scattered(self, grasp_setup):
        """GraspEBM corner_gather pre-projects the feature image through
        fine_embedding.layer_0's feature slice; energies must match the
        reference-shaped 4-tap scattered gather path up to matmul/lerp
        reassociation (exact linear identity; f32 here)."""
        model, params, inputs, scene = grasp_setup
        m_scatter = GraspEBM(**TINY, corner_gather=False)
        rng = np.random.default_rng(3)
        poses = np.stack([np.eye(4, dtype=np.float32)] * 8)[None]
        poses[0, :, :3, 3] = rng.uniform(0.3, 0.5, size=(8, 3)).astype(np.float32)
        poses = jnp.asarray(poses)
        # identical param tree (SliceableDense mirrors nn.Dense)
        p2 = m_scatter.init(jax.random.PRNGKey(0), poses, *inputs)["params"]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            params, p2)
        e_corner = model.apply({"params": params}, poses, *inputs)
        e_scatter = m_scatter.apply({"params": params}, poses, *inputs)
        # on this box tests execute on the tunneled TPU (the axon
        # sitecustomize overrides JAX_PLATFORMS=cpu — see conftest NOTE), so
        # the pre-projection matmul runs at bf16 default precision; observed
        # ~4e-3. On a true-CPU runner the two paths agree to ~1e-6.
        np.testing.assert_allclose(np.asarray(e_corner), np.asarray(e_scatter),
                                   rtol=2e-2, atol=8e-3)


class TestHashGridField:
    """Hash-grid grasp field (BASELINE config 4): the instant-NGP encoding of
    probe world positions feeds the energy readout as an extra stream."""

    def test_energy_and_table_gradients(self, grasp_setup):
        _, _, inputs, _ = grasp_setup
        model = GraspEBM(**TINY, hash_encoding=True, hash_levels=4,
                         hash_size_log2=8, hash_finest_res=64,
                         workspace_bounds=WORKSPACE)
        rng = np.random.default_rng(5)
        poses = np.stack([np.eye(4, dtype=np.float32)] * 4)[None]
        poses[0, :, :3, 3] = rng.uniform(0.35, 0.6, size=(4, 3)).astype(np.float32)
        poses = jnp.asarray(poses)
        params = model.init(jax.random.PRNGKey(0), poses, *inputs)["params"]
        assert "hash_tables" in params
        assert "activation_downscale_extra" in params["grasp_readout"]

        energies = model.apply({"params": params}, poses, *inputs)
        assert energies.shape == (1, 4)
        assert np.all(np.isfinite(np.asarray(energies)))

        def loss(p):
            return jnp.sum(model.apply({"params": p}, poses, *inputs) ** 2)

        grads = jax.grad(loss)(params)
        g_tables = np.asarray(grads["hash_tables"])
        assert np.isfinite(g_tables).all()
        assert np.abs(g_tables).max() > 0.0  # tables actually train

    def test_checkpoint_roundtrip_with_hash(self, grasp_setup, tmp_path):
        """GRASP_COMPONENTS stores/loads hash_tables when present and skips
        it for non-hash models (all-or-nothing otherwise)."""
        from tcnerf.models import checkpoint as ckpt

        _, _, inputs, _ = grasp_setup
        model = GraspEBM(**TINY, hash_encoding=True, hash_levels=2,
                         hash_size_log2=6, hash_finest_res=32,
                         workspace_bounds=WORKSPACE)
        poses = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2)[None])
        params = model.init(jax.random.PRNGKey(1), poses, *inputs)["params"]
        path = str(tmp_path / "model_final")
        ckpt.store(path, params, ckpt.GRASP_COMPONENTS)
        zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
        restored = ckpt.load(path, zeroed, ckpt.GRASP_COMPONENTS)
        assert restored is not None
        np.testing.assert_array_equal(np.asarray(restored["hash_tables"]),
                                      np.asarray(params["hash_tables"]))


class TestTrainFusion:
    """Opt-in fusion-decoder co-training (grasp_training.train_fusion):
    the language stage trains combine_clip_visual alongside the readout —
    a beyond-reference option (the reference trains grasp_readout only,
    delta_ngf/model.py:294-296) needed when the frozen CLIP towers are
    random (see language_convergence.yaml)."""

    def _language_setup(self):
        # n_features pinned at 256: the fusion decoders end in fixed
        # 256-channel convs (reference layers.py:523-660)
        cfg = dict(TINY, n_features=256)
        model = GraspEBM(**cfg, fusion="v4", clip_layers=(1, 1, 1, 1),
                         clip_width=8, clip_embed_dim=32, clip_text_width=16,
                         clip_text_layers=1, clip_image_size=32,
                         remat_fusion=True)
        scene = SyntheticScene.random(1, n_spheres=2)
        colors, configs = generate_views(scene, 3, height=H, width=W,
                                         radius=1.0, polar=0.6)
        ext_inv, k4 = camera_parameters(configs[0])
        imgs = jnp.asarray(colors[0][..., :3] / 255.0, jnp.float32)[None, None]
        intr = jnp.asarray(k4, jnp.float32)[None, None]
        ext = jnp.asarray(ext_inv, jnp.float32)[None, None]
        tokens = jnp.zeros((1, 77), jnp.int32)
        poses0 = jnp.tile(jnp.eye(4), (1, 2, 1, 1)).astype(jnp.float32)
        params = model.init(jax.random.PRNGKey(0), poses0, imgs, intr, ext,
                            tokens, method="init_all")["params"]
        rng = np.random.default_rng(5)
        n_l, n_g = 6, 4

        def poses(n):
            t = rng.uniform([0.3, -0.2, 0.0], [0.7, 0.2, 0.3],
                            (1, n, 3)).astype(np.float32)
            q = rng.normal(size=(1, n, 4)).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            return jnp.asarray(t), jnp.asarray(q)

        l_t, l_r = poses(n_l)
        g_t, g_r = poses(n_g)
        onehot = np.zeros((1, n_l), np.float32)
        onehot[:, 0] = 1.0
        labels = [jnp.asarray(onehot),
                  jnp.asarray(rng.normal(size=(1, n_g, 3)), np.float32),
                  jnp.asarray(rng.normal(size=(1, n_g, 4)), np.float32)]
        inputs = [l_t, l_r, g_t, g_r, imgs, intr, ext, tokens]
        return model, params, inputs, labels

    def test_fusion_decoder_trains_and_backbone_stays_frozen(self):
        model, params, inputs, labels = self._language_setup()
        state = GT.create_grasp_train_state(
            model, params, trainable=("grasp_readout", "combine_clip_visual"))
        before_fusion = jax.tree_util.tree_leaves(
            state.params["combine_clip_visual"])
        before_backbone = jax.tree_util.tree_leaves(
            state.params["fine_embedding"])
        for _ in range(2):
            state, metrics = GT.delta_ngf_train_step(
                state, inputs, labels, "kl_divergence", "quaternion", True)
        assert np.isfinite(float(metrics["landscape_loss"]))
        after_fusion = jax.tree_util.tree_leaves(
            state.params["combine_clip_visual"])
        changed = any(not np.array_equal(np.asarray(a), np.asarray(b))
                      for a, b in zip(before_fusion, after_fusion))
        assert changed, "fusion decoder did not train under train_fusion"
        for a, b in zip(before_backbone,
                        jax.tree_util.tree_leaves(
                            state.params["fine_embedding"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_default_keeps_fusion_frozen(self):
        model, params, inputs, labels = self._language_setup()
        state = GT.create_grasp_train_state(model, params)  # reference mode
        before = jax.tree_util.tree_leaves(params["combine_clip_visual"])
        state, _ = GT.delta_ngf_train_step(
            state, inputs, labels, "kl_divergence", "quaternion", True)
        for a, b in zip(before, jax.tree_util.tree_leaves(
                state.params["combine_clip_visual"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
