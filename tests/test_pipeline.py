"""GraspPipeline (deployment API) and multi-host input-sharding tests.

The pipeline wraps the reference's scattered inference flow
(utils/optimization.py:40-153) behind one object; the host-shard arithmetic
backs the multi-host DCN input pipeline (SURVEY.md §2.13).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcnerf.data.generators import camera_parameters
from tcnerf.data.synthetic import SyntheticScene, generate_views
from tcnerf.models import checkpoint as ckpt
from tcnerf.models.grasp import GraspEBM
from tcnerf.models.pipeline import GraspPipeline

H, W = 48, 64
TINY = dict(
    n_views=1, n_features=32, original_image_size=(H, W), n_5d_poses=3,
    n_blocks=2, hidden_size=32, vit_size=(32, 32), vit_patch=16, vit_dim=32,
    vit_heads=2, vit_hooks=(1, 2, 3, 4),
)
WORKSPACE = ((0.3, 0.7), (-0.25, 0.25), (0.0, 0.3))


class TestGraspPipeline:
    def test_from_checkpoints_and_infer(self, tmp_path):
        scene = SyntheticScene.random(0, n_spheres=2)
        colors, configs = generate_views(scene, 2, height=H, width=W,
                                         radius=1.0, polar=0.6)
        src = colors[0][..., :3] / 255.0
        ext_inv, k4 = camera_parameters(configs[0])
        images = np.asarray(src, np.float32)[None, None]
        intr = np.asarray(k4, np.float32)[None, None]
        ext = np.asarray(ext_inv, np.float32)[None, None]

        model = GraspEBM(**TINY)
        poses = jnp.tile(jnp.eye(4), (1, 2, 1, 1)).astype(jnp.float32)
        params = model.init(jax.random.PRNGKey(0), poses,
                            jnp.asarray(images), jnp.asarray(intr),
                            jnp.asarray(ext))["params"]
        ckpt.store(os.path.join(tmp_path, "model_final"), params,
                   ckpt.GRASP_COMPONENTS)

        pipe = GraspPipeline.from_checkpoints(
            model, str(tmp_path), WORKSPACE, n_initial_guesses=8,
            n_optimization_steps=2, top_k=3)
        # loaded params must be the stored ones (leaf-for-leaf)
        want = jax.tree_util.tree_leaves(params["grasp_readout"])
        got = jax.tree_util.tree_leaves(pipe.params["grasp_readout"])
        assert len(want) == len(got)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        result = pipe.infer(images, intr, ext, rng=0)
        assert len(result.poses) == 3
        assert len(result.scores) == 3
        # best-first ordering and finite energies
        assert result.scores == sorted(result.scores, reverse=True)
        assert np.isfinite(result.all_energies).all()
        assert result.all_energies.shape == (8,)
        # returned poses are Affine transforms inside (or near) the workspace
        t = result.poses[0].translation
        assert np.isfinite(t).all()


class TestHostSharding:
    """parallel/distributed.py host-shard arithmetic (pure python, 1 host)."""

    def _patch(self, monkeypatch, pid, n):
        monkeypatch.setattr(jax, "process_index", lambda: pid)
        monkeypatch.setattr(jax, "process_count", lambda: n)

    def test_partition_disjoint_and_complete(self, monkeypatch):
        from tcnerf.parallel.distributed import host_shard_indices

        n_samples, n_proc = 10, 4
        shards = []
        for pid in range(n_proc):
            self._patch(monkeypatch, pid, n_proc)
            shards.append(host_shard_indices(n_samples))
        # ceil-partition: 3,3,3,1
        assert [len(s) for s in shards] == [3, 3, 3, 1]
        all_idx = np.concatenate(shards)
        assert len(np.unique(all_idx)) == n_samples
        np.testing.assert_array_equal(np.sort(all_idx), np.arange(n_samples))

    def test_shuffled_partition_still_complete(self, monkeypatch):
        from tcnerf.parallel.distributed import host_shard_indices

        n_samples, n_proc = 17, 3
        shards = []
        for pid in range(n_proc):
            self._patch(monkeypatch, pid, n_proc)
            shards.append(host_shard_indices(n_samples, rng=7))
        all_idx = np.concatenate(shards)
        np.testing.assert_array_equal(np.sort(all_idx), np.arange(n_samples))
        # same rng on every host -> the same permutation (shards disjoint)
        assert len(np.unique(all_idx)) == n_samples
        # shuffled: not the identity order
        assert not np.array_equal(all_idx, np.arange(n_samples))

    def test_single_host_identity(self):
        from tcnerf.parallel.distributed import host_shard_indices

        np.testing.assert_array_equal(host_shard_indices(5), np.arange(5))
