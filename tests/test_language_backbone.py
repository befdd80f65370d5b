"""Language-variant backbone loading: the stage-1 NeRF renderer trained with
the LanguageNeRF fusion flavor (use_dense=True, elu) must hand its fusion
decoder to the grasp stage — reference LanguageNeRF.load_backbone restores
_combine_clip_visual alongside _fine_embedding/_visual_features
(lmvnerf/model_v4.py:131-152)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnerf.models import checkpoint as ckpt
from tcnerf.models.grasp import GraspEBM
from tcnerf.models.renderer import MVNeRFRenderer

H, W = 48, 64
# n_features is pinned at 256: the fusion decoders end in fixed
# 256-channel convs (reference layers.py:523-660), so any fusion model's
# feature image is 256-wide regardless of scale.
SHARED = dict(
    n_views=1, n_features=256, original_image_size=(H, W),
    n_blocks=2, hidden_size=32,
    vit_size=(32, 32), vit_patch=16, vit_dim=32, vit_heads=2,
    vit_hooks=(1, 2, 3, 4),
    clip_layers=(1, 1, 1, 1), clip_width=8, clip_embed_dim=32,
    clip_image_size=32,
)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def stage1_and_stage2_params():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(size=(1, 1, H, W, 3)), jnp.float32)
    k4 = jnp.eye(4, dtype=jnp.float32)[None, None]
    renderer = MVNeRFRenderer(
        n_samples=4, near=0.5, far=1.5, fusion="v4",
        fusion_use_dense=True, fusion_activation="elu", **SHARED)
    ro = jnp.zeros((1, 2, 3), jnp.float32)
    rd = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 2, 1))
    r_params = renderer.init(jax.random.PRNGKey(0), (ro, rd, src, k4, k4))["params"]

    ebm = GraspEBM(n_5d_poses=3, fusion="v4", clip_text_width=16,
                   clip_text_layers=1, **SHARED)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, 4, 1, 1))
    tokens = jnp.zeros((1, 77), jnp.int32)
    e_params = ebm.init(jax.random.PRNGKey(0), poses, src, k4, k4, tokens,
                        method="init_all")["params"]
    return r_params, e_params


def test_fusion_decoder_loads_into_grasp_stage(tmp_path,
                                               stage1_and_stage2_params):
    r_params, e_params = stage1_and_stage2_params
    # Perturb the stored decoder so it provably differs from the stage-2
    # random init: both stages init from PRNGKey(0) and flax folds keys by
    # module path, so the raw 'combine_clip_visual' inits are bit-identical
    # across stages — a "restored != random init" check on unperturbed
    # params would be vacuous. (Seeds must stay equal:
    # test_frozen_clip_towers_coincide_across_stages relies on it.)
    r_params = dict(r_params)
    r_params["combine_clip_visual"] = jax.tree_util.tree_map(
        lambda x: x + 1.0, r_params["combine_clip_visual"])
    path = str(tmp_path / "model_final")
    ckpt.store(path, r_params, ckpt.RENDERER_COMPONENTS)

    wanted = ckpt.BACKBONE_COMPONENTS + ("combine_clip_visual",)
    restored = ckpt.load(path, dict(e_params), wanted)
    assert restored is not None
    for component in wanted:
        _tree_equal(restored[component], r_params[component])
    # and the fusion decoder actually changed vs the stage-2 random init
    before = jax.tree_util.tree_leaves(e_params["combine_clip_visual"])
    after = jax.tree_util.tree_leaves(restored["combine_clip_visual"])
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(before, after))


def test_frozen_clip_towers_coincide_across_stages(stage1_and_stage2_params):
    """Both stages build the frozen CLIP visual tower as a top-level
    `clip_visual` module and init from the same seed, so the 'externally
    shared frozen CLIP' of the reference (clip/model.py:5-8) is reproduced
    by construction — stage 2 sees the same tower stage 1 trained against."""
    r_params, e_params = stage1_and_stage2_params
    _tree_equal(r_params["clip_visual"], e_params["clip_visual"])


def _grasp_cfg(backbone_dir, **training):
    from tcnerf.train.config import Config
    return Config.wrap({"grasp_training":
                        dict(backbone_path=str(backbone_dir), **training)})


class _FakeState:
    def __init__(self, params):
        self.params = params

    def replace(self, params):
        return _FakeState(params)


def test_require_backbone_raises_when_missing(tmp_path,
                                              stage1_and_stage2_params):
    """grasp_training.require_backbone restores the reference's strictness
    (train_goal.py:58-62 FileNotFoundError); ADVICE r3."""
    from tcnerf.train.grasp_common import load_backbone
    _, e_params = stage1_and_stage2_params
    state = _FakeState(dict(e_params))
    with pytest.raises(FileNotFoundError):
        load_backbone(state, _grasp_cfg(tmp_path / "nowhere",
                                        require_backbone=True))
    # default stays permissive (synthetic out-of-the-box runs)
    _, loaded = load_backbone(state, _grasp_cfg(tmp_path / "nowhere"))
    assert not loaded


def test_meta_flavor_mismatch_blocks_fusion_decoder(tmp_path,
                                                    stage1_and_stage2_params):
    """A relu-flavor stage-1 decoder has the same param tree as the elu one
    GraspEBM hardcodes — only the sidecar metadata can catch it (ADVICE r3)."""
    from tcnerf.train.grasp_common import load_backbone
    r_params, e_params = stage1_and_stage2_params
    path = str(tmp_path / "model_final")
    ckpt.store(path, r_params, ckpt.RENDERER_COMPONENTS)
    ckpt.store_meta(path, {"fusion": "v4", "fusion_use_dense": True,
                           "fusion_activation": "relu"})
    state = _FakeState(dict(e_params))
    # permissive: falls back to the bare backbone (loaded=True, but the
    # fusion decoder stays at its stage-2 init)
    new_state, loaded = load_backbone(state, _grasp_cfg(tmp_path),
                                      fusion=True)
    assert loaded
    a = jax.tree_util.tree_leaves(new_state.params["combine_clip_visual"])
    b = jax.tree_util.tree_leaves(e_params["combine_clip_visual"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # strict: the flavor mismatch is a hard error
    with pytest.raises(ValueError):
        load_backbone(state, _grasp_cfg(tmp_path, require_backbone=True),
                      fusion=True)
    # correct flavor passes through
    ckpt.store_meta(path, {"fusion": "v4", "fusion_use_dense": True,
                           "fusion_activation": "elu"})
    _, loaded = load_backbone(state, _grasp_cfg(tmp_path,
                                                require_backbone=True),
                              fusion=True)
    assert loaded


def test_load_backbone_degrades_without_fusion_decoder(tmp_path,
                                                       stage1_and_stage2_params):
    """A 'without'-flavor stage-1 checkpoint has no fusion decoder; the
    language loader must fall back to the bare backbone, not fail."""
    r_params, e_params = stage1_and_stage2_params
    path = str(tmp_path / "model_final")
    ckpt.store(path, r_params, ckpt.BACKBONE_COMPONENTS)  # no fusion decoder

    wanted = ckpt.BACKBONE_COMPONENTS + ("combine_clip_visual",)
    assert ckpt.load(path, dict(e_params), wanted) is None
    restored = ckpt.load(path, dict(e_params), ckpt.BACKBONE_COMPONENTS)
    assert restored is not None
    for component in ckpt.BACKBONE_COMPONENTS:
        _tree_equal(restored[component], r_params[component])
