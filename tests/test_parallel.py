"""Multi-device mesh tests on the virtual 8-device CPU backend.

The standard fake-backend substitute for a TPU pod slice (SURVEY.md §4d):
shardings must compile AND execute; parameters must stay replicated after an
update; pose-guess sharding must produce identical energies to single-device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

requires_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@requires_mesh
class TestMeshTraining:
    def test_sharded_train_step_matches_replicated(self):
        from __graft_entry__ import _tiny_setup
        from tcnerf.models import training as T
        from tcnerf.parallel.mesh import (make_mesh, shard_nerf_batch,
                                          shard_params)

        mesh = make_mesh(8, data_axis=2)
        model, inputs, labels = _tiny_setup(batch=2, n_rays=32 * 4)
        state = T.create_train_state(model, jax.random.PRNGKey(0), inputs)

        # single-device step
        s1, m1 = T.nerf_train_step(state, inputs, labels, jax.random.PRNGKey(3))

        # sharded step
        state_sh = state.replace(params=shard_params(state.params, mesh),
                                 opt_state=shard_params(state.opt_state, mesh))
        inputs_sh, labels_sh = shard_nerf_batch(inputs, labels, mesh)
        s2, m2 = T.nerf_train_step(state_sh, inputs_sh, labels_sh,
                                   jax.random.PRNGKey(3))

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-4)
        a = np.asarray(s1.params["coarse_embedding"]["layer_0"]["kernel"])
        b = np.asarray(s2.params["coarse_embedding"]["layer_0"]["kernel"])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_params_replicated_after_update(self):
        from __graft_entry__ import _tiny_setup
        from tcnerf.models import training as T
        from tcnerf.parallel.mesh import (make_mesh, shard_nerf_batch,
                                          shard_params)

        mesh = make_mesh(8, data_axis=2)
        model, inputs, labels = _tiny_setup(batch=2, n_rays=32 * 4)
        state = T.create_train_state(model, jax.random.PRNGKey(0), inputs)
        state = state.replace(params=shard_params(state.params, mesh),
                              opt_state=shard_params(state.opt_state, mesh))
        inputs, labels = shard_nerf_batch(inputs, labels, mesh)
        new_state, _ = T.nerf_train_step(state, inputs, labels,
                                         jax.random.PRNGKey(1))
        kernel = new_state.params["coarse_embedding"]["layer_0"]["kernel"]
        assert kernel.sharding.is_fully_replicated

    def test_pose_guess_sharding(self):
        """Energy ascent with guesses sharded over the full mesh matches
        the unsharded result."""
        from tcnerf.models.grasp import GraspEBM
        from tcnerf.opt.pose_optimizer import PoseOptimizer
        from tcnerf.parallel.mesh import make_mesh, pose_shardings
        from tcnerf.data.synthetic import SyntheticScene, generate_views
        from tcnerf.data.generators import camera_parameters

        scene = SyntheticScene.random(0, n_spheres=2)
        colors, configs = generate_views(scene, 3, height=32, width=40,
                                         radius=1.0, polar=0.6)
        ext_inv, k4 = camera_parameters(configs[0])
        imgs = jnp.asarray(colors[0][..., :3] / 255.0, jnp.float32)[None, None]
        intr = jnp.asarray(k4, jnp.float32)[None, None]
        ext = jnp.asarray(ext_inv, jnp.float32)[None, None]

        model = GraspEBM(n_views=1, n_features=32, original_image_size=(32, 40),
                         n_5d_poses=3, n_blocks=2, hidden_size=32,
                         vit_size=(32, 32), vit_patch=16, vit_dim=32,
                         vit_heads=2, vit_hooks=(1, 2, 3, 4))
        poses0 = jnp.tile(jnp.eye(4), (1, 4, 1, 1)).astype(jnp.float32)
        params = model.init(jax.random.PRNGKey(0), poses0, imgs, intr,
                            ext)["params"]
        feats = model.apply({"params": params}, imgs, method="encode")

        opt = PoseOptimizer(apply_fn=model.apply, params=params,
                            workspace_bounds=[[0.3, 0.7], [-0.2, 0.2], [0, 0.3]],
                            n_initial_guesses=16, n_images=1, n_views=1)
        guesses = opt.generate_initial_guesses(rng=0)
        state = opt.init_state(guesses)
        e_plain = np.asarray(
            opt.compute_current_grasp_success(state, (imgs, intr, ext), feats))

        mesh = make_mesh(8, data_axis=1)
        sharding = pose_shardings(mesh)
        state_sh = opt.init_state([
            jax.device_put(jnp.asarray(guesses[0]), sharding),
            jax.device_put(jnp.asarray(guesses[1]), sharding),
        ])
        e_sh = np.asarray(
            opt.compute_current_grasp_success(state_sh, (imgs, intr, ext),
                                              feats))
        np.testing.assert_allclose(e_plain, e_sh, rtol=1e-4, atol=1e-5)


@requires_mesh
class TestExplicitShardMap:
    """tcnerf.parallel.explicit: hand-placed collectives via shard_map."""

    def test_explicit_train_step_runs_and_replicates(self):
        from __graft_entry__ import _tiny_setup
        from tcnerf.models import training as T
        from tcnerf.parallel.explicit import make_explicit_train_step
        from tcnerf.parallel.mesh import (make_mesh, shard_nerf_batch,
                                          shard_params)

        mesh = make_mesh(8, data_axis=2)
        model, inputs, labels = _tiny_setup(batch=2, n_rays=32 * 4)
        state = T.create_train_state(model, jax.random.PRNGKey(0), inputs)
        state = state.replace(params=shard_params(state.params, mesh),
                              opt_state=shard_params(state.opt_state, mesh))
        inputs, labels = shard_nerf_batch(inputs, labels, mesh)

        step = make_explicit_train_step(mesh)
        s1, m1 = step(state, inputs, labels, jax.random.PRNGKey(3))
        assert np.isfinite(float(m1["loss"]))
        # deterministic: same inputs -> same loss
        s2, m2 = step(state, inputs, labels, jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]))
        # params must remain fully replicated after the explicit pmean update
        leaf = jax.tree_util.tree_leaves(s1.params)[0]
        assert leaf.sharding.is_fully_replicated
        assert int(s1.step) == int(state.step) + 1
        # the pmean'd gradients must be finite and populated: adam's second
        # moment accumulates |g|^2 (warmup lr keeps the params still at step 0)
        nu = jax.tree_util.tree_leaves(s1.opt_state)
        total = sum(float(jnp.sum(jnp.abs(x))) for x in nu
                    if hasattr(x, "dtype") and jnp.issubdtype(
                        x.dtype, jnp.floating))
        assert np.isfinite(total) and total > 0.0

    def test_explicit_ascent_step_matches_single_device(self):
        from tcnerf.parallel.explicit import make_explicit_ascent_step
        from tcnerf.parallel.mesh import make_mesh, pose_shardings

        mesh = make_mesh(8, data_axis=2)

        def energy(t, r):
            return -jnp.sum(t ** 2, axis=-1) - jnp.sum(r ** 2, axis=-1)

        rng = np.random.default_rng(0)
        t = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
        r = jnp.asarray(rng.normal(size=(1, 64, 4)).astype(np.float32))

        want_t, want_r = jax.grad(
            lambda a, b: -jnp.sum(energy(a, b)), argnums=(0, 1))(t, r)

        grads = make_explicit_ascent_step(mesh, energy)
        sh = pose_shardings(mesh)
        t_sh = jax.device_put(t, sh)
        r_sh = jax.device_put(r, sh)
        got_t, got_r = grads(t_sh, r_sh)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                                   rtol=1e-5, atol=1e-6)


@requires_mesh
class TestShardedServing:
    def test_sharded_render_matches_one_device(self):
        """render_image_sharded (parallel/serve.py): the full-image render
        with ray chunks sharded over an 8-device mesh must match the same
        program on a 1-device mesh — device count must not change the
        image (same per-chunk keys by construction)."""
        from tcnerf.data.synthetic import SyntheticScene, generate_views
        from tcnerf.data.generators import camera_parameters
        from tcnerf.models.renderer import MVNeRFRenderer
        from tcnerf.parallel.mesh import make_mesh
        from tcnerf.parallel.serve import render_image_sharded

        h, w = 32, 40
        scene = SyntheticScene.random(2, n_spheres=2)
        colors, configs = generate_views(scene, 3, height=h, width=w,
                                         radius=1.0, polar=0.6)
        model = MVNeRFRenderer(
            n_views=1, n_samples=8, n_features=32, near=0.3, far=1.6,
            original_image_size=(h, w), fusion="without", n_blocks=2,
            hidden_size=32, vit_size=(32, 32), vit_patch=16, vit_dim=32,
            vit_heads=2, vit_hooks=(1, 2, 3, 4))
        ext_inv, k4 = camera_parameters(configs[0])
        src_images = jnp.asarray(
            colors[0][..., :3] / 255.0, jnp.float32)[None, None]
        intr = jnp.asarray(k4, jnp.float32)[None, None]
        ext = jnp.asarray(ext_inv, jnp.float32)[None, None]
        ray_o = jnp.zeros((1, 8, 3))
        ray_d = jnp.ones((1, 8, 3))
        feats = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 1, h, w, 32)),
            jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)},
            ray_o, ray_d, src_images, intr, ext, feats,
            method="render_rays")
        tgt_pose = jnp.asarray(configs[1]["pose"], jnp.float32)
        tgt_intr3 = jnp.asarray(configs[1]["intrinsics"].reshape(3, 3),
                                jnp.float32)

        def run(mesh):
            return render_image_sharded(
                mesh, model.apply, variables, src_images, intr, ext, feats,
                tgt_pose, tgt_intr3, jax.random.PRNGKey(5), h, w, chunk=128)

        rgb8, depth8 = run(make_mesh(8, data_axis=2))
        rgb1, depth1 = run(make_mesh(1))
        assert rgb8.shape == (h, w, 3) and depth8.shape == (h, w)
        np.testing.assert_allclose(np.asarray(rgb8), np.asarray(rgb1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(depth8), np.asarray(depth1),
                                   rtol=1e-5, atol=1e-6)
