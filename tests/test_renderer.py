"""End-to-end tests for the NeRF renderer family: init/shape contracts and a
tiny-scene overfit run (the CPU-runnable slice of BASELINE.json config 1)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tcnerf.core.rays import get_specific_rays, bbox_biased_sample
from tcnerf.data.synthetic import SyntheticScene, generate_views
from tcnerf.models.renderer import MVNeRFRenderer
from tcnerf.models import training as T
from tcnerf.models import checkpoint as ckpt

H, W = 48, 64
N_VIEWS = 2
TINY = dict(
    n_views=N_VIEWS, n_samples=8, n_features=32, near=0.3, far=1.6,
    original_image_size=(H, W), fusion="without", n_blocks=2, hidden_size=32,
    vit_size=(32, 32), vit_patch=16, vit_dim=32, vit_heads=2, vit_hooks=(1, 2, 3, 4),
)


def make_batch(scene, colors, configs, rng, n_rays=64, batch_size=1):
    ray_os, ray_ds, targets = [], [], []
    srcs, intrs, exts = [], [], []
    n_persp = len(configs)
    for _ in range(batch_size):
        idx = rng.choice(n_persp, size=N_VIEWS + 1, replace=False)
        tgt = idx[-1]
        pix = bbox_biased_sample(rng, n_rays, (0, 0, H, W), H, W)
        u, v = pix[:, 1].astype(np.float32), pix[:, 0].astype(np.float32)
        intr3 = configs[tgt]["intrinsics"].reshape(3, 3)
        ro, rd = get_specific_rays(u, v, configs[tgt]["pose"], intr3)
        ray_os.append(ro)
        ray_ds.append(rd)
        targets.append(colors[tgt][pix[:, 0], pix[:, 1], :3] / 255.0)
        src_imgs, src_intr, src_ext = [], [], []
        for s in idx[:-1]:
            src_imgs.append(colors[s][..., :3] / 255.0)
            k4 = np.eye(4)
            k4[:3, :3] = configs[s]["intrinsics"].reshape(3, 3)
            src_intr.append(k4)
            src_ext.append(np.linalg.inv(configs[s]["pose"]))
        srcs.append(src_imgs)
        intrs.append(src_intr)
        exts.append(src_ext)
    inputs = (
        jnp.asarray(np.array(ray_os, np.float32)),
        jnp.asarray(np.array(ray_ds, np.float32)),
        jnp.asarray(np.array(srcs, np.float32)),
        jnp.asarray(np.array(intrs, np.float32)),
        jnp.asarray(np.array(exts, np.float32)),
    )
    return inputs, jnp.asarray(np.array(targets, np.float32))


@pytest.fixture(scope="module")
def scene_data():
    scene = SyntheticScene.random(0, n_spheres=3)
    colors, configs = generate_views(scene, 6, height=H, width=W,
                                     radius=1.0, polar=0.6)
    return scene, colors, configs


class TestRendererForward:
    def test_shapes_and_determinism(self, scene_data):
        scene, colors, configs = scene_data
        rng = np.random.default_rng(1)
        inputs, labels = make_batch(scene, colors, configs, rng, n_rays=16)
        model = MVNeRFRenderer(**TINY)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "sampling": jax.random.PRNGKey(1)}, inputs)
        rgb, depth, fine_rgb, fine_depth, aux = model.apply(
            variables, inputs, rngs={"sampling": jax.random.PRNGKey(2)})
        assert rgb.shape == (1, 16, 3) and fine_rgb.shape == (1, 16, 3)
        assert depth.shape == (1, 16) and fine_depth.shape == (1, 16)
        assert float(aux) == 0.0
        assert np.isfinite(np.asarray(rgb)).all()
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
        # same rng -> identical output (deterministic sampling)
        rgb2, *_ = model.apply(variables, inputs, rngs={"sampling": jax.random.PRNGKey(2)})
        np.testing.assert_array_equal(np.asarray(rgb), np.asarray(rgb2))

    def test_depth_in_near_far(self, scene_data):
        scene, colors, configs = scene_data
        rng = np.random.default_rng(2)
        inputs, _ = make_batch(scene, colors, configs, rng, n_rays=16)
        model = MVNeRFRenderer(**TINY)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "sampling": jax.random.PRNGKey(1)}, inputs)
        _, depth, _, fine_depth, _ = model.apply(
            variables, inputs, rngs={"sampling": jax.random.PRNGKey(3)})
        assert np.asarray(depth).max() <= TINY["far"] + 1e-4
        assert np.asarray(fine_depth).min() >= 0.0


class TestRendererTraining:
    def test_overfit_tiny_scene(self, scene_data):
        scene, colors, configs = scene_data
        rng = np.random.default_rng(3)
        model = MVNeRFRenderer(**TINY)
        inputs0, labels0 = make_batch(scene, colors, configs, rng)
        tx = T.make_nerf_optimizer(nerf_lr=5e-3, feature_lr=5e-4, warmup_steps=10,
                                   scale_down_after=10**9)
        state = T.create_train_state(model, jax.random.PRNGKey(0), inputs0, tx=tx)

        key = jax.random.PRNGKey(42)
        losses = []
        for i in range(30):
            key, k1 = jax.random.split(key)
            inputs, labels = make_batch(scene, colors, configs, rng)
            state, metrics = T.nerf_train_step(state, inputs, labels, k1)
            losses.append(float(metrics["loss"]))
        first = np.mean(losses[:5])
        last = np.mean(losses[-5:])
        assert np.isfinite(losses).all()
        assert last < 0.75 * first, f"loss did not decrease: {first} -> {last}"

    def test_frozen_group_and_multi_lr_routing(self, scene_data):
        scene, colors, configs = scene_data
        rng = np.random.default_rng(4)
        inputs, labels = make_batch(scene, colors, configs, rng, n_rays=8)
        model = MVNeRFRenderer(**TINY)
        tx = T.make_nerf_optimizer(nerf_lr=1e-3, feature_lr=1e-4, warmup_steps=1,
                                   scale_down_after=10**9)
        state = T.create_train_state(model, jax.random.PRNGKey(0), inputs, tx=tx)
        before = jax.tree_util.tree_map(np.asarray, state.params)
        # two steps: the warmup schedule evaluates to 0 at optimizer step 0
        # (reference WarmupScheduler has the same first-step behavior)
        state2, _ = T.nerf_train_step(state, inputs, labels, jax.random.PRNGKey(5))
        state2, _ = T.nerf_train_step(state2, inputs, labels, jax.random.PRNGKey(6))
        after = state2.params
        # nerf group moved
        moved = np.abs(
            np.asarray(after["coarse_embedding"]["layer_0"]["kernel"])
            - before["coarse_embedding"]["layer_0"]["kernel"]).max()
        assert moved > 0
        # encoder group also trains (smaller LR)
        moved_f = np.abs(
            np.asarray(after["visual_features"]["conv_features"]["stem_conv"]["kernel"])
            - before["visual_features"]["conv_features"]["stem_conv"]["kernel"]).max()
        assert moved_f > 0


class TestCheckpoint:
    def test_store_load_roundtrip(self, scene_data, tmp_path):
        scene, colors, configs = scene_data
        rng = np.random.default_rng(5)
        inputs, _ = make_batch(scene, colors, configs, rng, n_rays=8)
        model = MVNeRFRenderer(**TINY)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "sampling": jax.random.PRNGKey(1)}, inputs)
        params = variables["params"]
        path = str(tmp_path / "model_final")
        comps = ckpt.RENDERER_WITHOUT_COMPONENTS
        ckpt.store(path, params, comps)
        assert ckpt.exists(path, comps)
        zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
        restored = ckpt.load(path, zeroed, comps)
        assert restored is not None
        orig = np.asarray(params["fine_embedding"]["layer_0"]["kernel"])
        np.testing.assert_array_equal(
            np.asarray(restored["fine_embedding"]["layer_0"]["kernel"]), orig)

    def test_load_missing_returns_none(self, tmp_path):
        assert ckpt.load(str(tmp_path / "nope"), {"fine_embedding": {}},
                         ("fine_embedding",)) is None


class TestMultiView:
    def test_three_view_renderer_forward(self, scene_data):
        """nerf_model 3_view config path: mid-network mean fusion over views."""
        scene, colors, configs = scene_data
        rng = np.random.default_rng(7)
        cfg3 = dict(TINY)
        cfg3["n_views"] = 3
        model = MVNeRFRenderer(**cfg3)

        # build a 3-view batch
        idx = rng.choice(len(configs), size=4, replace=False)
        pix = bbox_biased_sample(rng, 8, (0, 0, H, W), H, W)
        intr3 = configs[idx[-1]]["intrinsics"].reshape(3, 3)
        ro, rd = get_specific_rays(pix[:, 1].astype(np.float32),
                                   pix[:, 0].astype(np.float32),
                                   configs[idx[-1]]["pose"], intr3)
        srcs, intrs, exts = [], [], []
        for s in idx[:-1]:
            srcs.append(colors[s][..., :3] / 255.0)
            k4 = np.eye(4)
            k4[:3, :3] = configs[s]["intrinsics"].reshape(3, 3)
            intrs.append(k4)
            exts.append(np.linalg.inv(configs[s]["pose"]))
        inputs = (
            jnp.asarray(ro, jnp.float32)[None],
            jnp.asarray(rd, jnp.float32)[None],
            jnp.asarray(np.array(srcs, np.float32))[None],
            jnp.asarray(np.array(intrs, np.float32))[None],
            jnp.asarray(np.array(exts, np.float32))[None],
        )
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "sampling": jax.random.PRNGKey(1)}, inputs)
        rgb, depth, fine_rgb, fine_depth, aux = model.apply(
            variables, inputs, rngs={"sampling": jax.random.PRNGKey(2)})
        assert rgb.shape == (1, 8, 3) and fine_rgb.shape == (1, 8, 3)
        assert np.isfinite(np.asarray(fine_rgb)).all()
        # view order must not matter for the mean-fusion output
        perm = [2, 0, 1]
        inputs_p = (inputs[0], inputs[1], inputs[2][:, perm],
                    inputs[3][:, perm], inputs[4][:, perm])
        rgb_p, *_ = model.apply(variables, inputs_p,
                                rngs={"sampling": jax.random.PRNGKey(2)})
        # mean fusion is permutation-invariant mathematically; the tolerance
        # absorbs bf16-precision matmul reassociation (platform default)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_p),
                                   rtol=0.05, atol=0.02)


class TestCornerGatherParity:
    def test_corner_path_matches_scattered_path(self, scene_data):
        """corner_gather=True pre-projects the feature image through layer_0's
        feature-kernel slice and gathers one row per sample; output must match
        the reference-shaped 4-tap scattered path up to matmul/lerp
        reassociation (exact linear-algebra identity; f32 here)."""
        scene, colors, configs = scene_data
        rng = np.random.default_rng(11)
        inputs, _ = make_batch(scene, colors, configs, rng, n_rays=16)
        m_corner = MVNeRFRenderer(**TINY)
        m_scatter = MVNeRFRenderer(**TINY, corner_gather=False)
        variables = m_corner.init({"params": jax.random.PRNGKey(0),
                                   "sampling": jax.random.PRNGKey(1)}, inputs)
        # identical param trees: SliceableDense mirrors nn.Dense's tree/init
        v2 = m_scatter.init({"params": jax.random.PRNGKey(0),
                             "sampling": jax.random.PRNGKey(1)}, inputs)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            variables, v2)
        out_c = m_corner.apply(variables, inputs,
                               rngs={"sampling": jax.random.PRNGKey(2)})
        out_s = m_scatter.apply(variables, inputs,
                                rngs={"sampling": jax.random.PRNGKey(2)})
        # reassociation error is amplified by the inverse-CDF resample (fine
        # sample positions shift with the coarse weights); observed max ~2e-4
        for a, b in zip(out_c[:4], out_s[:4]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-3)


@pytest.mark.skipif(jax.devices()[0].platform == "cpu",
                    reason="real Pallas kernels need a TPU backend")
class TestPallasMLPRenderer:
    def test_pallas_mlp_matches_jnp_chain(self, scene_data):
        """pallas_mlp=True runs the residual chains as the fused VMEM
        kernel; output must match the jnp chain within bf16-execution
        tolerance (kernel accumulates in f32, jnp chain in the module
        dtype)."""
        scene, colors, configs = scene_data
        rng = np.random.default_rng(13)
        inputs, _ = make_batch(scene, colors, configs, rng, n_rays=16)
        cfg = dict(TINY)
        cfg["hidden_size"] = 128  # kernel wants lane-aligned hidden width
        m_ref = MVNeRFRenderer(**cfg)
        m_pal = MVNeRFRenderer(**cfg, pallas_mlp=True)
        variables = m_ref.init({"params": jax.random.PRNGKey(0),
                                "sampling": jax.random.PRNGKey(1)}, inputs)
        out_r = m_ref.apply(variables, inputs,
                            rngs={"sampling": jax.random.PRNGKey(2)})
        out_p = m_pal.apply(variables, inputs,
                            rngs={"sampling": jax.random.PRNGKey(2)})
        for a, b in zip(out_r[:4], out_p[:4]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=8e-3)


class TestRematParity:
    def test_remat_matches_plain_outputs_and_grads(self, scene_data):
        """remat=True (training memory configuration: rematerialized MLP
        chains + encoder, scattered gather) is a pure scheduling change —
        outputs, the param tree, AND gradients must match the plain model
        exactly (same float ops, recomputed instead of stored)."""
        scene, colors, configs = scene_data
        rng = np.random.default_rng(17)
        inputs, labels = make_batch(scene, colors, configs, rng, n_rays=16)
        m_plain = MVNeRFRenderer(**TINY, corner_gather=False)
        m_remat = MVNeRFRenderer(**TINY, corner_gather=False, remat=True)
        variables = m_plain.init({"params": jax.random.PRNGKey(0),
                                  "sampling": jax.random.PRNGKey(1)}, inputs)
        v2 = m_remat.init({"params": jax.random.PRNGKey(0),
                           "sampling": jax.random.PRNGKey(1)}, inputs)
        # lifted nn.remat must not move/rename any parameter
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            variables, v2)

        def loss_fn(model):
            def f(params):
                rgb, _, fine_rgb, _, aux = model.apply(
                    {"params": params}, inputs,
                    rngs={"sampling": jax.random.PRNGKey(2)})
                return (jnp.mean((labels - rgb) ** 2)
                        + jnp.mean((labels - fine_rgb) ** 2) + aux)
            return f

        l_p, g_p = jax.value_and_grad(loss_fn(m_plain))(variables["params"])
        l_r, g_r = jax.value_and_grad(loss_fn(m_remat))(variables["params"])
        np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-6)
        # not bit-exact: the recomputed forward refuses differently under XLA
        # (observed max rel diff ~2e-3 on 0.3% of grad elements, f32)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-5),
            g_p, g_r)


class TestChunkedTrainStep:
    def test_chunked_step_matches_manual_chunk_loss(self, scene_data):
        """nerf_train_step(ray_chunk=k) gradient-checkpoints the render over
        ray chunks (full-scale HBM requirement, models/training.py). The
        scan+checkpoint machinery must produce the same loss and gradients
        as a plain python loop over the same chunks (same per-chunk keys,
        no remat)."""
        scene, colors, configs = scene_data
        rng = np.random.default_rng(23)
        inputs, labels = make_batch(scene, colors, configs, rng, n_rays=32)
        model = MVNeRFRenderer(**TINY, corner_gather=False)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "sampling": jax.random.PRNGKey(1)}, inputs)
        params = variables["params"]
        key = jax.random.PRNGKey(7)
        ray_chunk, n_chunks = 8, 4
        ray_o, ray_d, src_images, src_intr, src_ext = inputs
        b = ray_o.shape[0]

        def manual_loss(params):
            flat = src_images.reshape((-1,) + src_images.shape[2:])
            combined, aux = model.apply({"params": params}, flat,
                                        method="combine_features")
            combined = combined.reshape(
                (b, src_images.shape[1]) + combined.shape[1:])
            keys = jax.random.split(key, n_chunks)
            total = 0.0
            for i in range(n_chunks):
                sl = slice(i * ray_chunk, (i + 1) * ray_chunk)
                rgb, _, fine_rgb, _ = model.apply(
                    {"params": params}, ray_o[:, sl], ray_d[:, sl],
                    src_images, src_intr, src_ext, combined,
                    rngs={"sampling": keys[i]}, method="render_rays")
                total = total + (jnp.mean((labels[:, sl] - rgb) ** 2)
                                 + jnp.mean((labels[:, sl] - fine_rgb) ** 2))
            return total / n_chunks + aux

        # pin matmul precision: on the TPU backend the default bf16 matmuls
        # round differently between the scan+checkpoint graph and the manual
        # loop (observed rel diff 8e-5 > rtol on the real chip); HIGHEST makes
        # both paths f32 so only benign fusion-order noise remains
        with jax.default_matmul_precision("highest"):
            l_ref, g_ref = jax.value_and_grad(manual_loss)(params)

            state = T.TrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                opt_state=T.make_nerf_optimizer().init(params),
                tx=T.make_nerf_optimizer(), apply_fn=model.apply)
            _, metrics = T.nerf_train_step(state, inputs, labels, key,
                                           ray_chunk=ray_chunk)
        np.testing.assert_allclose(float(metrics["loss"]), float(l_ref),
                                   rtol=1e-5)

        # and grads: recompute via the step's internal loss by running the
        # step from zero-momentum state and checking the applied update
        # direction matches adam on g_ref for a couple of leaves is overkill;
        # instead check the chunked loss_fn's grad directly
        import functools as _ft
        grad_fn = jax.grad(lambda p: _chunked_loss(model, p, inputs, labels,
                                                   key, ray_chunk))
        with jax.default_matmul_precision("highest"):
            g_chunk = grad_fn(params)
        # scan-vs-python-loop accumulation order: observed max abs diff
        # ~2e-5 on 0.1% of elements (f32)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-4),
            g_ref, g_chunk)


def _chunked_loss(model, params, inputs, labels, key, ray_chunk):
    """The chunked scan+checkpoint loss exactly as nerf_train_step builds it."""
    ray_o, ray_d, src_images, src_intr, src_ext = inputs
    b, r = ray_o.shape[:2]
    v = src_images.shape[1]
    n_chunks = r // ray_chunk
    flat = src_images.reshape((b * v,) + src_images.shape[2:])
    combined, aux = model.apply({"params": params}, flat,
                                method="combine_features")
    combined = combined.reshape((b, v) + combined.shape[1:])

    def chunk_axes(x):
        return x.reshape((b, n_chunks, ray_chunk) + x.shape[2:]).swapaxes(0, 1)

    def body(carry, xs):
        ro, rd, lab, k = xs
        rgb, _, fine_rgb, _ = model.apply(
            {"params": params}, ro, rd, src_images, src_intr, src_ext,
            combined, rngs={"sampling": k}, method="render_rays")
        return carry + (jnp.mean((lab - rgb) ** 2)
                        + jnp.mean((lab - fine_rgb) ** 2)), None

    xs = (chunk_axes(ray_o), chunk_axes(ray_d), chunk_axes(labels),
          jax.random.split(key, n_chunks))
    total, _ = jax.lax.scan(jax.checkpoint(body, prevent_cse=False),
                            jnp.zeros(()), xs)
    return total / n_chunks + aux


@pytest.mark.skipif(os.environ.get("TCNERF_SLOW_TESTS") != "1",
                    reason="minutes-long learning test; TCNERF_SLOW_TESTS=1")
class TestStructureLearning:
    def test_learns_scene_structure_not_just_statistics(self):
        """Round-3 regression: with a well-posed rig (arc cameras, near/far
        covering the scene) and a working recipe, training must push the
        loss BELOW the view-averaged-blur floor (~0.035-0.05 = per-scene
        color variance). A model that only learns global color statistics
        passes loss-decreases tests but plateaus at that floor — this
        caught a clipped sampling interval and an ill-posed 360-degree rig
        (docs/convergence.md)."""
        import optax

        rng = np.random.default_rng(0)
        scenes = [SyntheticScene.random(rng, n_spheres=3) for _ in range(2)]
        views = [generate_views(s, 4, height=H, width=W, radius=0.9,
                                polar=0.7, azimuth_span=np.pi * 100 / 180)
                 for s in scenes]
        model = MVNeRFRenderer(**{**TINY, "n_views": 1, "near": 0.55,
                                  "far": 1.8, "n_samples": 32,
                                  "hidden_size": 64, "n_blocks": 4})

        def batch(scene_i):
            scene = scenes[scene_i]
            colors, configs = views[scene_i]
            idx = rng.choice(4, size=2, replace=False)
            # make_batch uses module-level N_VIEWS; build 1-view inputs here
            pix = bbox_biased_sample(rng, 256, (0, 0, H, W), H, W)
            u, v = pix[:, 1].astype(np.float32), pix[:, 0].astype(np.float32)
            tgt, src = int(idx[0]), int(idx[1])
            ro, rd = get_specific_rays(
                u, v, configs[tgt]["pose"],
                configs[tgt]["intrinsics"].reshape(3, 3))
            k4 = np.eye(4, dtype=np.float32)
            k4[:3, :3] = configs[src]["intrinsics"].reshape(3, 3)
            inputs = (
                jnp.asarray(ro[None], jnp.float32),
                jnp.asarray(rd[None], jnp.float32),
                jnp.asarray(colors[src][None, None, ..., :3] / 255.0,
                            jnp.float32),
                jnp.asarray(k4[None, None]),
                jnp.asarray(np.linalg.inv(configs[src]["pose"])[None, None]
                            .astype(np.float32)),
            )
            labels = jnp.asarray(
                colors[tgt][pix[:, 0], pix[:, 1], :3] / 255.0, jnp.float32)
            return inputs, labels[None]

        inputs0, labels0 = batch(0)
        tx = T.make_nerf_optimizer(nerf_lr=2e-3, feature_lr=2e-4,
                                   warmup_steps=25, scale_down_after=10**9)
        state = T.create_train_state(model, jax.random.PRNGKey(0), inputs0,
                                     tx=tx)
        key = jax.random.PRNGKey(7)
        losses = []
        for i in range(800):
            key, k1 = jax.random.split(key)
            inputs, labels = batch(i % 2)
            state, metrics = T.nerf_train_step(state, inputs, labels, k1)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        early = float(np.mean(losses[100:200]))
        tail = float(np.mean(losses[-100:]))
        # measured: broken recipes (clipped near/far, 360-ring, starved LR)
        # plateau flat at 0.038-0.054; the working recipe reaches ~0.034 by
        # step 800 and keeps falling (0.030 by 1200)
        assert tail < 0.036, (
            f"loss stuck at the blur floor ({tail:.4f}): the model is "
            "learning color statistics, not scene structure")
        assert tail < 0.85 * early, (
            f"loss stopped improving ({early:.4f} -> {tail:.4f})")
