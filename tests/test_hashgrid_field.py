"""Hash-grid fast-field renderer variant (nn/hashgrid_field.py,
models/renderer.py field="hashgrid") — the beyond-reference per-scene field
named in BASELINE.json config 4. The reference has no counterpart; the
pixel-conditioned field (reference layers.py:334-379) stays the parity
default and is covered by test_renderer.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcnerf.models import checkpoint as ckpt
from tcnerf.models import training as T
from tcnerf.models.renderer import MVNeRFRenderer

H, W = 48, 64


def small_model(**kw):
    return MVNeRFRenderer(
        n_views=1, n_samples=8, near=0.5, far=1.5, fusion="without",
        original_image_size=(H, W), field="hashgrid", hashgrid_levels=4,
        hashgrid_table_log2=8, hashgrid_hidden=32, hashgrid_layers=2, **kw)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    ro = jnp.zeros((1, 16, 3), jnp.float32)
    rd = jnp.asarray(rng.normal(size=(1, 16, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    src = jnp.asarray(rng.uniform(size=(1, 1, H, W, 3)), jnp.float32)
    k4 = jnp.eye(4, dtype=jnp.float32)[None, None]
    return (ro, rd, src, k4, k4)


def test_forward_shapes_and_no_tower_params(inputs):
    m = small_model()
    v = m.init({"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}, inputs)
    out = m.apply(v, inputs, rngs={"sampling": jax.random.PRNGKey(2)})
    rgb, depth, fine_rgb, fine_depth, aux = out
    assert rgb.shape == (1, 16, 3) and fine_rgb.shape == (1, 16, 3)
    assert depth.shape == (1, 16) and fine_depth.shape == (1, 16)
    # per-scene field: the encoder towers must never be constructed
    comps = sorted(v["params"].keys())
    assert comps == ["coarse_embedding", "coarse_readout", "fine_embedding",
                     "fine_readout"]
    assert "hash_tables" in v["params"]["coarse_embedding"]


def test_train_step_learns_tables(inputs):
    m = small_model()
    # warmup_steps=1: the default 10k-step linear warmup yields lr == 0 at
    # step 0 and this test takes only two steps
    state = T.create_train_state(m, jax.random.PRNGKey(0), inputs,
                                 tx=T.make_nerf_optimizer(warmup_steps=1))
    before = np.asarray(state.params["coarse_embedding"]["hash_tables"])
    labels = jnp.ones((1, 16, 3), jnp.float32) * 0.5
    for i in range(2):
        state, metrics = T.nerf_train_step(state, inputs, labels,
                                           jax.random.PRNGKey(3 + i))
    after = np.asarray(state.params["coarse_embedding"]["hash_tables"])
    assert np.isfinite(float(metrics["loss"]))
    assert not np.array_equal(before, after)


def test_checkpoint_roundtrip(tmp_path, inputs):
    m = small_model()
    v = m.init({"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}, inputs)
    path = str(tmp_path / "model_final")
    # the 'without' component list applies: store skips components the param
    # tree does not have (visual_features), load filters symmetrically
    ckpt.store(path, v["params"], ckpt.RENDERER_WITHOUT_COMPONENTS)
    v2 = m.init({"params": jax.random.PRNGKey(7),
                 "sampling": jax.random.PRNGKey(1)}, inputs)
    restored = ckpt.load(path, dict(v2["params"]),
                         ckpt.RENDERER_WITHOUT_COMPONENTS)
    assert restored is not None
    a = jax.tree_util.tree_leaves(restored)
    b = jax.tree_util.tree_leaves(v["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_second_order_differentiable(inputs):
    """The DeltaNGF energy path needs grad-of-grad through the field
    (reference delta_ngf/model.py:254-309); hash_encode is polynomial in the
    tables so second derivatives w.r.t. query positions must be finite."""
    m = small_model()
    v = m.init({"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}, inputs)
    ro, rd, src, k4, _ = inputs
    feat = jnp.zeros((1, 1, 1, 1, 0), jnp.float32)

    def render_sum(origin_shift):
        out = m.apply(v, ro + origin_shift, rd, src, k4, k4, feat,
                      rngs={"sampling": jax.random.PRNGKey(2)},
                      method="render_rays")
        return jnp.sum(out[2])

    g = jax.grad(render_sum)(jnp.zeros(3))
    gg = jax.grad(lambda s: jnp.sum(jax.grad(render_sum)(s) ** 2))(
        jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.isfinite(np.asarray(gg)))


def test_exclude_perspectives_held_out():
    """valid_from_train mode: the generator must never draw the excluded
    validation perspective as source or target."""
    import tempfile

    from tcnerf.data.generators import MVNeRFDataGenerator
    from tcnerf.data.loaders import ensure_dataset, load_dataset_nerf

    with tempfile.TemporaryDirectory() as root:
        ensure_dataset(root, 6, "nerf", n_samples=1, image_size=(24, 32))
        ds = load_dataset_nerf(6, root)
        gen = MVNeRFDataGenerator(ds, n_rays_train=8, batch_size=1, n_views=1,
                                  exclude_perspectives=(3,), rng=0)
        assert 3 not in gen.perspective_pool
        for _ in range(5):
            gen.get_data([0])  # draws stay inside the pool (no exception)
