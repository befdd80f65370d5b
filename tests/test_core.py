"""Golden tests for core geometry/sampling/compositing against tiny numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from tcnerf.core import se3, rays, sampling, projection, encoding, render
from tcnerf.ops import bilinear_gather
from tcnerf.ops.interpolate import gather_projection_features


class TestSE3:
    def test_quat_to_matrix_matches_scipy(self, rng):
        q = rng.normal(size=(32, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        got = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
        want = Rotation.from_quat(q).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matrix_to_quat_roundtrip(self, rng):
        m = Rotation.random(64, random_state=0).as_matrix().astype(np.float32)
        q = np.asarray(se3.matrix_to_quat(jnp.asarray(m)))
        m2 = Rotation.from_quat(q).as_matrix()
        np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_sixd_to_matrix_reference_semantics(self, rng):
        sixd = rng.normal(size=(16, 6)).astype(np.float32)
        got = np.asarray(se3.sixd_to_matrix(jnp.asarray(sixd)))
        r1 = sixd[:, :3] / np.linalg.norm(sixd[:, :3], axis=-1, keepdims=True)
        r2 = sixd[:, 3:] / np.linalg.norm(sixd[:, 3:], axis=-1, keepdims=True)
        r3 = np.cross(r1, r2)
        want = np.stack([r1, r2, r3], axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_pose_to_matrix_orthonormal_for_unit_quats(self, rng):
        t = rng.normal(size=(8, 3)).astype(np.float32)
        q = Rotation.random(8, random_state=1).as_quat().astype(np.float32)
        m = np.asarray(se3.pose_to_matrix(jnp.asarray(t), jnp.asarray(q)))
        assert m.shape == (8, 4, 4)
        np.testing.assert_allclose(m[:, 3], np.tile([0, 0, 0, 1], (8, 1)), atol=0)
        np.testing.assert_allclose(m[:, :3, 3], t, atol=1e-6)
        rtr = np.einsum("bij,bik->bjk", m[:, :3, :3], m[:, :3, :3])
        np.testing.assert_allclose(rtr, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)


class TestRays:
    def _camera(self):
        intr = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], dtype=np.float32)
        extr = np.eye(4, dtype=np.float32)
        extr[:3, :3] = Rotation.from_euler("xyz", [0.1, -0.2, 0.3]).as_matrix()
        extr[:3, 3] = [0.5, -0.25, 1.0]
        return intr, extr

    def test_principal_ray_points_down_camera_z(self):
        intr, extr = self._camera()
        rays_o, rays_d = rays.get_specific_rays([32.0], [24.0], extr, intr)
        np.testing.assert_allclose(rays_o[0], extr[:3, 3], atol=1e-6)
        np.testing.assert_allclose(rays_d[0], extr[:3, 2], atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(rays_d, axis=-1), 1.0, atol=1e-6)

    def test_get_rays_shape_and_corner(self):
        intr, extr = self._camera()
        ro, rd = rays.get_rays(64, 48, extr, intr)
        assert ro.shape == (48, 64, 3) and rd.shape == (48, 64, 3)
        ro1, rd1 = rays.get_specific_rays([5.0], [7.0], extr, intr)
        np.testing.assert_allclose(rd[7, 5], rd1[0], atol=1e-6)

    def test_jax_matches_numpy(self):
        intr, extr = self._camera()
        ro_np, rd_np = rays.get_rays(16, 12, extr, intr)
        ro_j, rd_j = rays.get_rays_jax(16, 12, jnp.asarray(extr), jnp.asarray(intr))
        np.testing.assert_allclose(np.asarray(rd_j), rd_np, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ro_j), ro_np, atol=1e-6)

    def test_bbox_biased_sample(self):
        s = rays.bbox_biased_sample(0, 100, (10, 20, 30, 40), 48, 64, in_box_p=0.8)
        assert s.shape == (100, 2)
        inside = s[:80]
        assert (inside[:, 0] >= 10).all() and (inside[:, 0] < 30).all()
        assert (inside[:, 1] >= 20).all() and (inside[:, 1] < 40).all()
        assert (s[:, 0] < 48).all() and (s[:, 1] < 64).all()


class TestEncoding:
    def test_ordering_and_values(self):
        x = jnp.array([[0.5, -1.0]])
        out = np.asarray(encoding.positional_encoding(x, n_freq=2, base_freq=np.pi))
        assert out.shape == (1, 8)
        want = []
        for d in [0.5, -1.0]:
            for f in [np.pi, 2 * np.pi]:
                want += [np.sin(d * f), np.cos(d * f)]
        np.testing.assert_allclose(out[0], np.array(want, dtype=np.float32), atol=1e-5)


class TestSampling:
    def test_stratified_within_bins(self):
        key = jax.random.PRNGKey(0)
        ro = jnp.zeros((2, 8, 3))
        rd = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (2, 8, 1))
        pts, z = sampling.sample_along_ray(key, ro, rd, 0.3, 1.3, 16)
        assert pts.shape == (2, 8, 16, 3) and z.shape == (2, 8, 16)
        step = (1.3 - 0.3) / 16
        lower = 0.3 + step * np.arange(16)
        zn = np.asarray(z)
        assert (zn >= lower - 1e-6).all() and (zn <= lower + step + 1e-6).all()
        np.testing.assert_allclose(np.asarray(pts)[..., 2], zn, atol=1e-6)
        assert np.abs(np.asarray(pts)[..., :2]).max() == 0

    def test_sample_pdf_concentrates_mass(self):
        key = jax.random.PRNGKey(1)
        bins = jnp.tile(jnp.linspace(0.0, 1.0, 63), (1, 4, 1))
        w = np.zeros((1, 4, 63), np.float32)
        w[..., 30:33] = 10.0  # nearly all mass around z ~ 0.48-0.52
        samples = np.asarray(sampling.sample_pdf(key, bins, jnp.asarray(w), 128))
        assert samples.shape == (1, 4, 128)
        frac = ((samples > 0.4) & (samples < 0.6)).mean()
        assert frac > 0.95
        assert (samples >= 0.0).all() and (samples <= 1.0).all()

    def test_sample_pdf_uniform_covers_range(self):
        key = jax.random.PRNGKey(2)
        bins = jnp.tile(jnp.linspace(0.3, 1.3, 63), (1, 2, 1))
        w = jnp.ones((1, 2, 63))
        s = np.asarray(sampling.sample_pdf(key, bins, w, 256))
        assert s.min() >= 0.3 - 1e-5 and s.max() <= 1.3 + 1e-5
        assert abs(s.mean() - 0.8) < 0.05


class TestProjection:
    def test_project_points_roundtrip_with_rays(self):
        intr3 = np.array([[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]], dtype=np.float32)
        extr = np.eye(4, dtype=np.float32)
        extr[:3, :3] = Rotation.from_euler("xyz", [0.2, 0.1, -0.4]).as_matrix()
        extr[:3, 3] = [0.2, 0.3, -0.5]
        intr4 = np.eye(4, dtype=np.float32)
        intr4[:3, :3] = intr3

        u, v = np.array([10.0, 50.0]), np.array([5.0, 40.0])
        ro, rd = rays.get_specific_rays(u, v, extr, intr3)
        world = (ro + 0.9 * rd)[None, :, None, :]  # [1, 2, 1, 3]

        pix, cam = projection.project_points_mv(
            jnp.asarray(world),
            jnp.asarray(intr4)[None, None],
            jnp.asarray(np.linalg.inv(extr))[None, None],
        )
        pix = np.asarray(pix)[0, 0, :, 0]
        np.testing.assert_allclose(pix[:, 0], u, atol=1e-2)
        np.testing.assert_allclose(pix[:, 1], v, atol=1e-2)
        # camera-space depth is positive in front of the camera
        assert (np.asarray(cam)[0, 0, :, 0, 2] > 0).all()

    def test_direction_transform_reproduces_reference_quirk(self):
        extr_inv = np.eye(4, dtype=np.float32)
        extr_inv[:3, 3] = [1.0, 2.0, 3.0]
        d = jnp.array([[[1.0, 0.0, 0.0]]])
        out = np.asarray(
            projection.world_to_camera_directions_mv(d, jnp.asarray(extr_inv)[None, None])
        )
        # w=1 homogenization means the translation leaks in: [1,0,0] + t
        np.testing.assert_allclose(out[0, 0, 0], [2.0, 2.0, 3.0], atol=1e-6)


class TestRender:
    def test_opaque_surface_renders_its_color_and_depth(self):
        z = jnp.tile(jnp.linspace(0.5, 1.5, 32), (1, 1, 1))
        density = np.zeros((1, 1, 32), np.float32)
        density[..., 16] = 1e6  # opaque wall at z[16]
        chroma = np.zeros((1, 1, 32, 3), np.float32)
        chroma[..., 16, :] = [0.2, 0.5, 0.9]
        rgb, depth, weights = render.volumetric_render(
            z, jnp.asarray(density), jnp.asarray(chroma))
        np.testing.assert_allclose(np.asarray(rgb)[0, 0], [0.2, 0.5, 0.9], atol=1e-4)
        np.testing.assert_allclose(np.asarray(depth)[0, 0], np.asarray(z)[0, 0, 16], atol=1e-4)
        np.testing.assert_allclose(np.asarray(weights).sum(), 1.0, atol=1e-4)

    def test_empty_space_renders_black(self):
        z = jnp.tile(jnp.linspace(0.5, 1.5, 8), (1, 1, 1))
        rgb, depth, w = render.volumetric_render(
            z, jnp.zeros((1, 1, 8)), jnp.ones((1, 1, 8, 3)))
        assert np.asarray(rgb).max() < 1e-6
        assert np.asarray(w).max() < 1e-6

    def test_weights_match_naive_cumprod(self, rng):
        z = jnp.tile(jnp.linspace(0.3, 1.3, 16), (2, 3, 1))
        sigma = jnp.asarray(rng.uniform(0, 5, size=(2, 3, 16)).astype(np.float32))
        chroma = jnp.asarray(rng.uniform(size=(2, 3, 16, 3)).astype(np.float32))
        rgb, depth, w = render.volumetric_render(z, sigma, chroma)
        # naive numpy oracle
        zn = np.asarray(z)
        dists = np.concatenate([zn[..., 1:] - zn[..., :-1],
                                (zn[..., -1:] - zn[..., -2:-1])], -1)
        alpha = 1 - np.exp(-dists * np.maximum(np.asarray(sigma), 0))
        om = 1 - alpha + 1e-10
        trans = np.cumprod(np.concatenate([np.ones_like(om[..., :1]), om[..., :-1]], -1), -1)
        wn = alpha * trans
        np.testing.assert_allclose(np.asarray(w), wn, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(rgb), (wn[..., None] * np.asarray(chroma)).sum(-2), rtol=1e-4, atol=1e-6)


class TestBilinearGather:
    def test_exact_on_grid_points(self, rng):
        img = jnp.asarray(rng.normal(size=(2, 8, 10, 4)).astype(np.float32))
        coords = jnp.array([[[3.0, 2.0], [0.0, 0.0], [9.0, 7.0]]] * 2)
        out = np.asarray(bilinear_gather(img, coords))
        np.testing.assert_allclose(out[0, 0], np.asarray(img)[0, 2, 3], atol=1e-6)
        np.testing.assert_allclose(out[1, 1], np.asarray(img)[1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[0, 2], np.asarray(img)[0, 7, 9], atol=1e-6)

    def test_midpoint_interpolation(self):
        img = np.zeros((1, 2, 2, 1), np.float32)
        img[0, :, :, 0] = [[0.0, 1.0], [2.0, 3.0]]
        out = np.asarray(bilinear_gather(jnp.asarray(img), jnp.array([[[0.5, 0.5]]])))
        np.testing.assert_allclose(out[0, 0, 0], 1.5, atol=1e-6)

    def test_out_of_bounds_clamps(self, rng):
        img = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
        out = np.asarray(bilinear_gather(img, jnp.array([[[-5.0, -5.0], [100.0, 100.0]]])))
        np.testing.assert_allclose(out[0, 0], np.asarray(img)[0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[0, 1], np.asarray(img)[0, 3, 3], atol=1e-6)

    def test_gather_projection_features_shapes(self, rng):
        imgs = jnp.asarray(rng.uniform(size=(1, 2, 12, 16, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(1, 2, 12, 16, 8)).astype(np.float32))
        pix = jnp.asarray(rng.uniform(0, 10, size=(1, 2, 5, 7, 2)).astype(np.float32))
        out = gather_projection_features(imgs, feats, pix)
        assert out.shape == (1, 2, 5, 7, 11)


class TestGradients:
    def test_render_is_differentiable(self):
        def loss(sigma):
            z = jnp.tile(jnp.linspace(0.3, 1.3, 8), (1, 1, 1))
            rgb, _, _ = render.volumetric_render(z, sigma, jnp.ones((1, 1, 8, 3)))
            return jnp.sum(rgb)

        g = jax.grad(loss)(jnp.ones((1, 1, 8)) * 0.5)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_bilinear_gather_grad_wrt_coords(self, rng):
        img = jnp.asarray(rng.normal(size=(1, 6, 6, 2)).astype(np.float32))

        def f(c):
            return jnp.sum(bilinear_gather(img, c))

        g = jax.grad(f)(jnp.array([[[2.3, 3.7]]]))
        assert np.isfinite(np.asarray(g)).all()
