"""Reference-format (TF tensor-bundle) checkpoint interop tests.

The reference stores weights with keras save_weights (TF checkpoint pairs,
src/lib/mvnerf/model_v0.py:199-240). tcnerf reads/writes that format with a
pure-python bundle codec (tcnerf/models/tf_checkpoint.py); these tests
round-trip the binary format and the keras key mapping, and exercise the
transparent fallback in models/checkpoint.load.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcnerf.models import checkpoint as ckpt
from tcnerf.models import tf_checkpoint as tfc


class TestBundleCodec:
    def test_roundtrip_tensors(self, tmp_path, rng):
        tensors = {
            "layer_with_weights-0/kernel/.ATTRIBUTES/VARIABLE_VALUE":
                rng.normal(size=(7, 13)).astype(np.float32),
            "layer_with_weights-0/bias/.ATTRIBUTES/VARIABLE_VALUE":
                rng.normal(size=(13,)).astype(np.float32),
            "layer_with_weights-1/kernel/.ATTRIBUTES/VARIABLE_VALUE":
                rng.normal(size=(2, 3, 4)).astype(np.float32),
            "counter/.ATTRIBUTES/VARIABLE_VALUE":
                np.asarray([42], np.int64),
        }
        prefix = str(tmp_path / "ckpt_component")
        tfc.write_bundle(prefix, tensors)
        assert (tmp_path / "ckpt_component.index").exists()
        assert (tmp_path / "ckpt_component.data-00000-of-00001").exists()

        loaded = tfc.read_bundle(prefix)
        assert set(loaded) == set(tensors)
        for k in tensors:
            np.testing.assert_array_equal(loaded[k], tensors[k])
            assert loaded[k].dtype == tensors[k].dtype

    def test_index_entries_expose_shapes(self, tmp_path, rng):
        prefix = str(tmp_path / "c")
        arr = rng.normal(size=(5, 6)).astype(np.float32)
        tfc.write_bundle(prefix, {"w/.ATTRIBUTES/VARIABLE_VALUE": arr})
        index = tfc.read_index(prefix)
        entry = index["w/.ATTRIBUTES/VARIABLE_VALUE"]
        assert entry["shape"] == (5, 6)
        assert entry["size"] == arr.nbytes

    def test_rejects_non_bundle(self, tmp_path):
        p = tmp_path / "bogus.index"
        p.write_bytes(b"\x00" * 64)
        with pytest.raises(ValueError, match="magic"):
            tfc.read_index(str(tmp_path / "bogus"))


class TestKerasKeyMapping:
    def test_embedding_key_order_matches_creation_order(self):
        """MVResNetMLP trees map layer_0 -> layer_with_weights-0, then
        feature blocks, then fusion blocks (reference layers.py:334-379)."""
        tree = {
            "layer_0": {"kernel": np.zeros((4, 8)), "bias": np.zeros(8)},
            "feature_block_0": {
                "layer_0": {"kernel": np.zeros((8, 8)), "bias": np.zeros(8)},
                "layer_1": {"kernel": np.zeros((8, 8)), "bias": np.zeros(8)}},
            "fusion_block_0": {
                "layer_0": {"kernel": np.zeros((8, 8)), "bias": np.zeros(8)},
                "layer_1": {"kernel": np.zeros((8, 8)), "bias": np.zeros(8)}},
        }
        keys = dict(tfc.keras_variable_keys(tree))
        assert keys[("layer_0", "kernel")] == (
            "layer_with_weights-0/kernel/.ATTRIBUTES/VARIABLE_VALUE")
        assert keys[("feature_block_0", "layer_0", "kernel")] == (
            "layer_with_weights-1/layer_with_weights-0/"
            "kernel/.ATTRIBUTES/VARIABLE_VALUE")
        assert keys[("fusion_block_0", "layer_1", "bias")] == (
            "layer_with_weights-2/layer_with_weights-1/"
            "bias/.ATTRIBUTES/VARIABLE_VALUE")

    def test_component_export_import_roundtrip(self, tmp_path, rng):
        from tcnerf.nn.mlp import MVResNetMLPEmbedding

        model = MVResNetMLPEmbedding(n_blocks=2, hidden_size=16, n_views=1)
        pos = jnp.asarray(rng.normal(size=(1, 2, 3, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(1, 2, 3, 8)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), pos, pos, feats)["params"]

        prefix = str(tmp_path / "model_final_fine_embedding")
        tfc.export_component(prefix, jax.device_get(params))
        zeros = jax.tree_util.tree_map(np.zeros_like, jax.device_get(params))
        restored = tfc.import_component(prefix, zeros)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            restored, jax.device_get(params))

    def test_import_shape_mismatch_is_loud(self, tmp_path, rng):
        tree = {"layer_0": {"kernel": rng.normal(size=(4, 4)).astype(np.float32),
                            "bias": np.zeros(4, np.float32)}}
        prefix = str(tmp_path / "c")
        tfc.export_component(prefix, tree)
        bad = {"layer_0": {"kernel": np.zeros((5, 4), np.float32),
                           "bias": np.zeros(4, np.float32)}}
        with pytest.raises(ValueError, match="mismatch"):
            tfc.import_component(prefix, bad)


class TestCheckpointTFFallback:
    def test_load_falls_back_to_tf_bundles(self, tmp_path, rng):
        """models.checkpoint.load reads reference-format checkpoint dirs when
        no msgpack files exist (VERDICT r1 item 8)."""
        from tcnerf.nn.mlp import MVResNetMLPEmbedding
        from tcnerf.nn.blocks import RenderReadout

        emb = MVResNetMLPEmbedding(n_blocks=2, hidden_size=16, n_views=1)
        pos = jnp.asarray(rng.normal(size=(1, 2, 3, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(1, 2, 3, 8)).astype(np.float32))
        emb_params = emb.init(jax.random.PRNGKey(0), pos, pos, feats)["params"]
        ro = RenderReadout(4)
        h = jnp.asarray(rng.normal(size=(1, 2, 3, 16)).astype(np.float32))
        ro_params = ro.init(jax.random.PRNGKey(1), h)["params"]

        params = {"fine_embedding": jax.device_get(emb_params),
                  "fine_readout": jax.device_get(ro_params)}
        path = str(tmp_path / "model_final")
        components = ("fine_embedding", "fine_readout")
        ckpt.store_tf(path, params, components)  # reference-layout export
        assert (tmp_path / "model_final_fine_embedding.index").exists()

        zeros = jax.tree_util.tree_map(np.zeros_like, params)
        restored = ckpt.load(path, zeros, components)
        assert restored is not None
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            restored, params)


class TestFullRendererRoundTrip:
    """Full reference-layout export of a TRAINED renderer — all six component
    suffixes of model_v0.py:199-240 — re-imported through the TF-bundle
    fallback (r3 VERDICT item 6: the export half of the real-weight story)."""

    def test_trained_six_component_tree(self, tmp_path):
        from tcnerf.models import training as T
        from tcnerf.models.renderer import MVNeRFRenderer

        h, w = 48, 64
        model = MVNeRFRenderer(
            n_views=1, n_samples=4, near=0.5, far=1.5, fusion="v4",
            # use_dense: the raw-multiply flavor requires the text embedding
            # to match the gate widths (only true at full 1024-d scale)
            fusion_use_dense=True,
            n_features=256, original_image_size=(h, w), n_blocks=2,
            hidden_size=32, vit_size=(32, 32), vit_patch=16, vit_dim=32,
            vit_heads=2, vit_hooks=(1, 2, 3, 4),
            clip_layers=(1, 1, 1, 1), clip_width=8, clip_embed_dim=32,
            clip_image_size=32)
        rng = np.random.default_rng(0)
        ro = jnp.zeros((1, 8, 3), jnp.float32)
        rd = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 8, 1))
        src = jnp.asarray(rng.uniform(size=(1, 1, h, w, 3)), jnp.float32)
        k4 = jnp.eye(4, dtype=jnp.float32)[None, None]
        inputs = (ro, rd, src, k4, k4)
        state = T.create_train_state(
            model, jax.random.PRNGKey(0), inputs,
            tx=T.make_nerf_optimizer(warmup_steps=1))
        labels = jnp.asarray(rng.uniform(size=(1, 8, 3)), jnp.float32)
        for i in range(2):  # actually train: params must differ from init
            state, _ = T.nerf_train_step(state, inputs, labels,
                                         jax.random.PRNGKey(3 + i))
        params = jax.device_get(state.params)
        assert sorted(ckpt.RENDERER_COMPONENTS) == sorted(
            c for c in params if c != "clip_visual")

        path = str(tmp_path / "model_final")
        ckpt.store_tf(path, params, ckpt.RENDERER_COMPONENTS)
        for c in ckpt.RENDERER_COMPONENTS:  # reference suffix layout
            assert (tmp_path / f"model_final_{c}.index").exists()
            assert (tmp_path / f"model_final_{c}.data-00000-of-00001").exists()

        fresh = model.init({"params": jax.random.PRNGKey(9),
                            "sampling": jax.random.PRNGKey(1)},
                           inputs)["params"]
        restored = ckpt.load(path, dict(jax.device_get(fresh)),
                             ckpt.RENDERER_COMPONENTS)
        assert restored is not None
        for c in ckpt.RENDERER_COMPONENTS:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)),
                restored[c], params[c])
