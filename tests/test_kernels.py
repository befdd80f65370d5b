"""Pallas kernel parity tests (interpret mode on CPU) and CLIP tower tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcnerf.ops.pallas.resmlp import (resmlp_reference, resmlp_rows,
                                      _flatten_params)


def _random_weights(rng, d_in, hidden, n_blocks, readout_dim=None):
    def w(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1)

    flat = [w((d_in, hidden)), w((hidden,))]
    for _ in range(n_blocks):
        flat += [w((hidden, hidden)), w((hidden,)),
                 w((hidden, hidden)), w((hidden,))]
    if readout_dim:
        flat += [w((hidden, readout_dim)), w((readout_dim,))]
    return flat


class TestResMLPKernel:
    @pytest.mark.parametrize("readout", [False, True])
    def test_parity_vs_reference(self, rng, readout):
        d_in, hidden, n_blocks = 64, 128, 3
        flat = _random_weights(rng, d_in, hidden, n_blocks,
                               readout_dim=4 if readout else None)
        x = jnp.asarray(rng.normal(size=(300, d_in)).astype(np.float32))
        got = resmlp_rows(x, tuple(flat), n_blocks, readout=readout,
                          tile=128, interpret=True)
        want = resmlp_reference(x, flat, n_blocks, readout=readout)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_parity_vs_flax_module(self, rng):
        """The kernel must reproduce MVResNetMLPEmbedding's fused-view path
        (n_views=1) bit-for-bit up to f32 tolerance."""
        from tcnerf.nn.mlp import MVResNetMLPEmbedding

        n_blocks, hidden = 2, 32
        model = MVResNetMLPEmbedding(n_blocks=n_blocks, hidden_size=hidden,
                                     n_views=1, embed_direction_vector=True)
        pos = jnp.asarray(rng.normal(size=(1, 4, 8, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(1, 4, 8, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(1, 4, 8, 16)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), pos, dirs, feats)["params"]
        want = model.apply({"params": params}, pos, dirs, feats)

        from tcnerf.core.encoding import positional_encoding

        x = jnp.concatenate([positional_encoding(pos, 10),
                             positional_encoding(dirs, 10), feats], axis=-1)
        x = x.reshape(-1, x.shape[-1])
        # n_views=1: feature blocks then fusion blocks form one linear chain
        flat = [params["layer_0"]["kernel"], params["layer_0"]["bias"]]
        for name in ["feature_block_0", "fusion_block_0"]:
            block = params[name]
            flat += [block["layer_0"]["kernel"], block["layer_0"]["bias"],
                     block["layer_1"]["kernel"], block["layer_1"]["bias"]]
        got = resmlp_rows(x, tuple(flat), n_blocks=2, tile=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got).reshape(np.asarray(want).shape), np.asarray(want),
            rtol=2e-5, atol=2e-5)

    def test_row_padding(self, rng):
        """Rows not a multiple of the tile are padded and cropped correctly."""
        flat = _random_weights(rng, 16, 32, 1)
        x = jnp.asarray(rng.normal(size=(77, 16)).astype(np.float32))
        got = resmlp_rows(x, tuple(flat), 1, tile=64, interpret=True)
        want = resmlp_reference(x, flat, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestCLIPTowers:
    def test_visual_pyramid_shapes(self, rng):
        from tcnerf.clip.model import ModifiedResNet

        model = ModifiedResNet(layers=(1, 1, 1, 1), width=8, output_dim=16,
                               heads=2)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        emb, l1, l2, l3, l4 = model.apply({"params": params}, x)
        assert emb.shape == (1, 16)
        assert l1.shape == (1, 16, 16, 32)   # /4, width*4
        assert l2.shape == (1, 8, 8, 64)
        assert l3.shape == (1, 4, 4, 128)
        assert l4.shape == (1, 2, 2, 256)

    def test_text_tower_uses_eot_position(self, rng):
        from tcnerf.clip.model import TextTransformer
        from tcnerf.clip.tokenizer import tokenize

        model = TextTransformer(width=32, heads=2, n_layers=2, output_dim=16,
                                context_length=77)
        tokens = jnp.asarray(tokenize(["red ball", "a much longer instruction"]))
        params = model.init(jax.random.PRNGKey(0), tokens)["params"]
        out = model.apply({"params": params}, tokens)
        assert out.shape == (2, 16)
        assert np.isfinite(np.asarray(out)).all()
        # padding beyond EOT must not change the embedding
        tokens2 = np.asarray(tokens).copy()
        eot = int(np.argmax(tokens2[0]))
        tokens2[0, eot + 1:] = 0  # already zero, but ensure
        out2 = model.apply({"params": params}, jnp.asarray(tokens2))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)

    def test_torch_import_tree_matches(self, rng):
        """Synthetic torch state dict -> imported tree must shape-match init."""
        from tcnerf.clip.model import ModifiedResNet
        from tcnerf.clip.import_torch import import_clip_rn50_visual

        layers, width, heads, out_dim = (1, 1, 1, 1), 8, 2, 16
        model = ModifiedResNet(layers=layers, width=width, output_dim=out_dim,
                               heads=heads)
        x = jnp.ones((1, 32, 32, 3))
        want = model.init(jax.random.PRNGKey(0), x)["params"]

        # build a fake torch-layout state dict with transposed conv shapes
        sd = {}
        v = want

        def add_conv(name, flax_kernel):
            kh, kw, cin, cout = np.asarray(flax_kernel).shape
            sd[name + ".weight"] = rng.normal(size=(cout, cin, kh, kw)).astype(
                np.float32)

        def add_bn(name, c):
            sd[name + ".weight"] = np.ones(c, np.float32)
            sd[name + ".bias"] = np.zeros(c, np.float32)
            sd[name + ".running_mean"] = np.zeros(c, np.float32)
            sd[name + ".running_var"] = np.ones(c, np.float32)

        for i in (1, 2, 3):
            add_conv(f"visual.conv{i}", v[f"stem_conv{i}"]["kernel"])
            add_bn(f"visual.bn{i}", v[f"stem_bn{i}"]["scale"].shape[0])
        for stage in range(4):
            block = v[f"layer{stage + 1}_0"]
            pre = f"visual.layer{stage + 1}.0"
            for conv in ("conv1", "conv2", "conv3"):
                add_conv(f"{pre}.{conv}", block[conv]["kernel"])
            for bn in ("bn1", "bn2", "bn3"):
                add_bn(f"{pre}.{bn}", block[bn]["scale"].shape[0])
            if "downsample_conv" in block:
                add_conv(f"{pre}.downsample.0", block["downsample_conv"]["kernel"])
                add_bn(f"{pre}.downsample.1",
                       block["downsample_bn"]["scale"].shape[0])
        ap = v["attnpool"]
        c = ap["positional_embedding"].shape[1]
        sd["visual.attnpool.positional_embedding"] = rng.normal(
            size=ap["positional_embedding"].shape).astype(np.float32)
        for proj in ("q", "k", "v"):
            sd[f"visual.attnpool.{proj}_proj.weight"] = rng.normal(
                size=(c, c)).astype(np.float32)
            sd[f"visual.attnpool.{proj}_proj.bias"] = np.zeros(c, np.float32)
        sd["visual.attnpool.c_proj.weight"] = rng.normal(
            size=(out_dim, c)).astype(np.float32)
        sd["visual.attnpool.c_proj.bias"] = np.zeros(out_dim, np.float32)

        got = import_clip_rn50_visual(sd, layers=layers, heads=heads)["visual"]
        want_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, want)
        got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, got)
        assert want_shapes == got_shapes

    def test_vit_import_tree_matches(self, rng):
        from tcnerf.nn.vit import VisionTransformer
        from tcnerf.clip.import_torch import import_vit_b

        model = VisionTransformer(img_size=(32, 32), patch_size=16,
                                  embed_dim=24, num_heads=2, mlp_ratio=2,
                                  hooks=(1, 2))
        x = jnp.ones((1, 32, 32, 3))
        want = model.init(jax.random.PRNGKey(0), x)["params"]

        d = 24
        sd = {
            "cls_token": np.zeros((1, 1, d), np.float32),
            "pos_embed": np.zeros((1, 5, d), np.float32),
            "patch_embed.proj.weight": rng.normal(size=(d, 3, 16, 16)).astype(
                np.float32),
            "patch_embed.proj.bias": np.zeros(d, np.float32),
        }
        for i in range(2):
            pre = f"blocks.{i}"
            sd[f"{pre}.norm1.weight"] = np.ones(d, np.float32)
            sd[f"{pre}.norm1.bias"] = np.zeros(d, np.float32)
            sd[f"{pre}.norm2.weight"] = np.ones(d, np.float32)
            sd[f"{pre}.norm2.bias"] = np.zeros(d, np.float32)
            sd[f"{pre}.attn.qkv.weight"] = rng.normal(size=(3 * d, d)).astype(
                np.float32)
            sd[f"{pre}.attn.qkv.bias"] = np.zeros(3 * d, np.float32)
            sd[f"{pre}.attn.proj.weight"] = rng.normal(size=(d, d)).astype(
                np.float32)
            sd[f"{pre}.attn.proj.bias"] = np.zeros(d, np.float32)
            sd[f"{pre}.mlp.fc1.weight"] = rng.normal(size=(2 * d, d)).astype(
                np.float32)
            sd[f"{pre}.mlp.fc1.bias"] = np.zeros(2 * d, np.float32)
            sd[f"{pre}.mlp.fc2.weight"] = rng.normal(size=(d, 2 * d)).astype(
                np.float32)
            sd[f"{pre}.mlp.fc2.bias"] = np.zeros(d, np.float32)

        got = import_vit_b(sd, n_blocks=2, n_heads=2)
        want_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, want)
        got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, got)
        assert want_shapes == got_shapes


class TestCLIPPreprocess:
    def test_output_shape_and_standardization(self, rng):
        from tcnerf.clip.preprocess import preprocess

        x = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
        out = preprocess(x, to_size=32)
        assert out.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_constant_image_maps_to_known_value(self):
        from tcnerf.clip.preprocess import preprocess, CLIP_MEAN, CLIP_STD

        x = jnp.full((1, 64, 64, 3), 0.5)
        out = np.asarray(preprocess(x, to_size=32))
        want = (0.5 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        np.testing.assert_allclose(out[0, 16, 16], want, atol=1e-3)


class TestHashGrid:
    def test_shapes_and_determinism(self, rng):
        import jax
        import jax.numpy as jnp
        from tcnerf.ops.hashgrid import (HashGridConfig, hash_encode,
                                         init_hash_params)

        cfg = HashGridConfig(n_levels=4, table_size_log2=8,
                             base_resolution=4, finest_resolution=32)
        tables = init_hash_params(jax.random.PRNGKey(0), cfg)
        assert tables.shape == (4, 256, 2)
        x = jnp.asarray(rng.uniform(0.4, 0.8, size=(5, 7, 3)).astype(np.float32))
        out = hash_encode(tables, x, cfg)
        assert out.shape == (5, 7, cfg.out_dim)
        out2 = hash_encode(tables, x, cfg)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_continuity(self, rng):
        """Trilinear interpolation => nearby points get nearby encodings."""
        import jax
        import jax.numpy as jnp
        from tcnerf.ops.hashgrid import (HashGridConfig, hash_encode,
                                         init_hash_params)

        cfg = HashGridConfig(n_levels=2, table_size_log2=8,
                             base_resolution=4, finest_resolution=8)
        tables = init_hash_params(jax.random.PRNGKey(1), cfg) * 1e4  # O(1) feats
        x = jnp.asarray([[0.5, 0.0, 0.1]])
        eps = 1e-5
        a = np.asarray(hash_encode(tables, x, cfg))
        b = np.asarray(hash_encode(tables, x + eps, cfg))
        assert np.abs(a - b).max() < 1e-2

    def test_gradients_flow_to_tables(self, rng):
        import jax
        import jax.numpy as jnp
        from tcnerf.ops.hashgrid import (HashGridConfig, hash_encode,
                                         init_hash_params)

        cfg = HashGridConfig(n_levels=2, table_size_log2=6,
                             base_resolution=2, finest_resolution=4)
        tables = init_hash_params(jax.random.PRNGKey(2), cfg)
        x = jnp.asarray(rng.uniform(0.4, 0.8, size=(10, 3)).astype(np.float32))

        g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, cfg) ** 2))(tables)
        assert np.abs(np.asarray(g)).max() > 0


class TestFusedField:
    def test_parity_with_flax_field(self, rng):
        """fused_field (Pallas chain, interpret) must match the renderer's
        flax _field path for n_views=1."""
        import flax.linen as nn
        from tcnerf.models.fused import fused_field, flatten_mv_params
        from tcnerf.nn.blocks import RenderReadout
        from tcnerf.nn.mlp import MVResNetMLPEmbedding
        from tcnerf.core import projection
        from tcnerf.ops.interpolate import gather_projection_features

        n_blocks, hidden = 2, 32
        b, r, s = 1, 3, 4
        world = jnp.asarray(rng.uniform(0.3, 0.7, (b, r, s, 3)).astype(np.float32))
        z = jnp.asarray(np.sort(rng.uniform(0.3, 1.3, (b, r, s)).astype(np.float32)))
        imgs = jnp.asarray(rng.uniform(-1, 1, (b, 1, 16, 20, 3)).astype(np.float32))
        feats_img = jnp.asarray(rng.normal(size=(b, 1, 16, 20, 8)).astype(np.float32))
        k4 = np.eye(4, dtype=np.float32)
        k4[:3, :3] = [[20, 0, 10], [0, 20, 8], [0, 0, 1]]
        intr = jnp.asarray(k4)[None, None]
        ext = jnp.eye(4)[None, None]
        cam_dirs = jnp.asarray(rng.normal(size=(b, 1, r, 3)).astype(np.float32))

        class Field(nn.Module):
            @nn.compact
            def __call__(self, world, z, cam_dirs):
                pixel_xy, cam_points = projection.project_points_mv(world, intr, ext)
                feats = gather_projection_features(imgs, feats_img, pixel_xy)
                dirs = jnp.broadcast_to(cam_dirs[:, :, :, None, :], (b, 1, r, s, 3))
                flat = lambda x: x.reshape((b, r, s, x.shape[-1]))
                emb = MVResNetMLPEmbedding(
                    n_blocks=n_blocks, hidden_size=hidden, n_views=1,
                    embed_direction_vector=True, name="mlp")(
                        flat(cam_points[..., :3]), flat(dirs), flat(feats))
                return RenderReadout(4, name="ro")(emb)

        field = Field()
        params = field.init(jax.random.PRNGKey(0), world, z, cam_dirs)["params"]
        want_c, want_d = field.apply({"params": params}, world, z, cam_dirs)

        flat_w = flatten_mv_params(params["mlp"], n_blocks, params["ro"])
        got_c, got_d = fused_field(flat_w, world, z, cam_dirs, imgs, intr, ext,
                                   feats_img, n_blocks, tile=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                                   rtol=2e-4, atol=2e-4)


class TestSortMerge:
    def test_sort_small_matches_jnp_sort(self, rng):
        from tcnerf.ops.sortmerge import sort_small

        v = jnp.asarray(rng.normal(size=(3, 5, 32)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(sort_small(v)),
                                      np.sort(np.asarray(v), axis=-1))

    def test_sort_small_with_duplicates(self):
        from tcnerf.ops.sortmerge import sort_small

        v = jnp.asarray([[3.0, 1.0, 3.0, 1.0, 2.0, 2.0, 0.5, 9.0]])
        np.testing.assert_array_equal(np.asarray(sort_small(v)),
                                      np.sort(np.asarray(v), axis=-1))

    def test_merge_sorted(self, rng):
        from tcnerf.ops.sortmerge import merge_sorted

        a = np.sort(rng.normal(size=(4, 16)).astype(np.float32), axis=-1)
        b = np.sort(rng.normal(size=(4, 16)).astype(np.float32), axis=-1)
        got = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
        want = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
        np.testing.assert_array_equal(got, want)

    def test_merge_sorted_with_shared_values(self):
        from tcnerf.ops.sortmerge import merge_sorted

        a = jnp.asarray([[0.0, 1.0, 2.0]])
        b = jnp.asarray([[1.0, 1.0, 3.0]])
        got = np.asarray(merge_sorted(a, b))
        np.testing.assert_array_equal(got, [[0.0, 1.0, 1.0, 1.0, 2.0, 3.0]])


class TestCornerGather:
    def test_exact_parity_with_bilinear_gather(self, rng):
        from tcnerf.ops.interpolate import (bilinear_gather,
                                            bilinear_gather_corners,
                                            make_corner_image)

        img = jnp.asarray(rng.normal(size=(2, 17, 23, 5)).astype(np.float32))
        coords = jnp.asarray(
            rng.uniform(-1.0, 25.0, size=(2, 64, 2)).astype(np.float32))
        want = bilinear_gather(img, coords)
        got = bilinear_gather_corners(make_corner_image(img), coords)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_corner_image_layout(self, rng):
        from tcnerf.ops.interpolate import make_corner_image

        img = jnp.asarray(rng.normal(size=(1, 4, 6, 3)).astype(np.float32))
        c4 = np.asarray(make_corner_image(img))
        img = np.asarray(img)
        assert c4.shape == (1, 4, 6, 12)
        np.testing.assert_array_equal(c4[0, 1, 2, 0:3], img[0, 1, 2])
        np.testing.assert_array_equal(c4[0, 1, 2, 3:6], img[0, 1, 3])
        np.testing.assert_array_equal(c4[0, 1, 2, 6:9], img[0, 2, 2])
        np.testing.assert_array_equal(c4[0, 1, 2, 9:12], img[0, 2, 3])
        # edge clamp
        np.testing.assert_array_equal(c4[0, 3, 5, 9:12], img[0, 3, 5])


class TestResMLPSkipInput:
    def test_skip_input_parity(self, rng):
        """skip_input=True treats x as the hidden stream (layer_0 folded
        outside — the corner-gather path); weights hold blocks only."""
        hidden, n_blocks = 128, 3
        flat = _random_weights(rng, hidden, hidden, n_blocks)[2:]  # drop w0/b0
        x = jnp.asarray(rng.normal(size=(300, hidden)).astype(np.float32))
        got = resmlp_rows(x, tuple(flat), n_blocks, skip_input=True,
                          tile=128, interpret=True)
        want = resmlp_reference(x, flat, n_blocks, skip_input=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestResMLPCustomVJP:
    """resmlp_rows_diff: Pallas forward + remat-jnp backward must match the
    pure-jnp path in both value and gradients (VERDICT r1 item 4)."""

    @pytest.mark.parametrize("skip_input", [False, True])
    def test_grad_parity(self, rng, skip_input):
        from tcnerf.ops.pallas.resmlp import resmlp_rows_diff

        d_in, hidden, n_blocks = (128 if skip_input else 64), 128, 2
        flat = _random_weights(rng, d_in, hidden, n_blocks)
        if skip_input:
            flat = flat[2:]
        flat = tuple(flat)
        x = jnp.asarray(rng.normal(size=(200, d_in)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(200, hidden)).astype(np.float32))

        def loss_pallas(x_, w_):
            out = resmlp_rows_diff(x_, w_, n_blocks, False, "relu", 128,
                                   skip_input, True)
            return jnp.mean((out - tgt) ** 2)

        def loss_ref(x_, w_):
            out = resmlp_reference(x_, w_, n_blocks, skip_input=skip_input)
            return jnp.mean((out - tgt) ** 2)

        (v_p, (dx_p, dw_p)) = jax.value_and_grad(loss_pallas, (0, 1))(x, flat)
        (v_r, (dx_r, dw_r)) = jax.value_and_grad(loss_ref, (0, 1))(x, flat)
        np.testing.assert_allclose(float(v_p), float(v_r), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                                   rtol=5e-4, atol=5e-5)
        for gp, gr in zip(dw_p, dw_r):
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                       rtol=5e-4, atol=5e-5)

    def test_embedding_use_pallas_trains(self, rng):
        """MVResNetMLPEmbedding(use_pallas=True) must produce finite grads
        through the fused chain (interpret-mode kernel on CPU runners)."""
        from tcnerf.nn.mlp import MVResNetMLPEmbedding

        model = MVResNetMLPEmbedding(n_blocks=2, hidden_size=128, n_views=1,
                                     use_pallas=True)
        pos = jnp.asarray(rng.normal(size=(1, 4, 8, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(1, 4, 8, 3)).astype(np.float32))
        feats = jnp.asarray(
            rng.normal(size=(1, 4, 8, 16)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), pos, dirs, feats)["params"]

        ref_model = MVResNetMLPEmbedding(n_blocks=2, hidden_size=128,
                                         n_views=1, use_pallas=False)

        def loss(m, p):
            out = m.apply({"params": p}, pos, dirs, feats)
            return jnp.mean(out ** 2)

        try:
            g = jax.grad(lambda p: loss(model, p))(params)
        except Exception as e:  # pragma: no cover - CPU without mosaic
            pytest.skip(f"pallas compiled path unavailable: {e}")
        g_ref = jax.grad(lambda p: loss(ref_model, p))(params)
        flat_g = jax.tree_util.tree_leaves(g)
        flat_r = jax.tree_util.tree_leaves(g_ref)
        for a, b in zip(flat_g, flat_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-4)


class TestSortedWindowGather:
    """ops/pallas/swg.py: the sorted-window fused gather+MLP kernel."""

    def _setup(self, rng, h=16, w=250, n_blocks=2):
        hidden = 128
        img = jnp.asarray(rng.normal(size=(h, w, hidden)).astype(np.float32))
        head_k = jnp.asarray(
            rng.normal(size=(120, hidden)).astype(np.float32) * 0.05)
        head_b = jnp.asarray(rng.normal(size=(hidden,)).astype(np.float32))
        flat = []
        for _ in range(n_blocks):
            flat += [jnp.asarray(rng.normal(size=(hidden, hidden))
                                 .astype(np.float32) * 0.05),
                     jnp.zeros(hidden)] * 2
        flat += [jnp.asarray(rng.normal(size=(hidden, 4))
                             .astype(np.float32) * 0.05), jnp.zeros(4)]
        return img, head_k, head_b, tuple(flat)

    def _reference(self, img, head_k, head_b, flat, n_blocks, coords, pos,
                   dirs):
        from tcnerf.core.encoding import positional_encoding
        from tcnerf.ops.interpolate import bilinear_gather
        from tcnerf.ops.pallas.resmlp import resmlp_reference

        feats = bilinear_gather(img[None], coords[None])[0]
        enc = jnp.concatenate([positional_encoding(pos, 10),
                               positional_encoding(dirs, 10)], -1)
        h0 = enc @ head_k + head_b + feats
        return resmlp_reference(h0, flat, n_blocks, readout=True,
                                skip_input=True)

    @pytest.mark.parametrize("n,label,fast", [
        (8192, "dense-kernel", False),
        (8192, "dense-transposed", True),
        (1024, "sparse-fallback", False),
        (1000, "nonmultiple-n", False)])
    def test_swg_rows_parity(self, rng, n, label, fast):
        """Kernel path (dense), the transposed fused-geometry kernel
        (fast=True), overflow fallback (sparse) and padding (non-multiple N)
        must all match the plain XLA 4-tap gather + chain."""
        from tcnerf.ops.pallas.swg import prepare_image, swg_rows

        h, w, n_blocks = 16, 250, 2
        img, head_k, head_b, flat = self._setup(rng, h, w, n_blocks)
        coords = jnp.asarray(np.stack([rng.uniform(0, w - 1, n),
                                       rng.uniform(0, h - 1, n)], -1)
                             .astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

        grouped, w_pad, w_groups = prepare_image(img, ka=4)
        # pin matmul precision: on a TPU backend interpret-mode matmuls run
        # at the default bf16 precision and exceed the f32 tolerances
        with jax.default_matmul_precision("highest"):
            out, ov = swg_rows(grouped, w_pad, w_groups, w, h, coords, pos,
                               dirs, head_k, head_b, flat, n_blocks, ka=4,
                               bq=512, fast=fast, interpret=True)
            if label.startswith("dense"):
                assert not bool(ov), \
                    "dense queries must not overflow the window"
            ref = self._reference(img, head_k, head_b, flat, n_blocks,
                                  coords, pos, dirs)
        scale = float(jnp.max(jnp.abs(ref)))
        tol = 2e-2 if fast else 1e-3   # fast = bf16 stream + recurrences
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=tol * scale, rtol=tol)

    def test_swg_field_matches_flax_field(self, rng):
        """swg_field through the renderer-layout params must match the flax
        _field math (1-view)."""
        import flax.linen as nn
        from tcnerf.core import projection
        from tcnerf.models.fused import swg_field
        from tcnerf.nn.blocks import RenderReadout
        from tcnerf.nn.mlp import MVResNetMLPEmbedding
        from tcnerf.ops.interpolate import gather_projection_features
        from tcnerf.ops.pallas.swg import prepare_image

        n_blocks, hidden = 2, 128
        b, r, s = 1, 3, 4
        n_feats = 8
        world = jnp.asarray(
            rng.uniform(0.3, 0.7, (b, r, s, 3)).astype(np.float32))
        z = jnp.asarray(
            np.sort(rng.uniform(0.3, 1.3, (b, r, s)).astype(np.float32)))
        imgs = jnp.asarray(
            rng.uniform(-1, 1, (b, 1, 16, 20, 3)).astype(np.float32))
        feats_img = jnp.asarray(
            rng.normal(size=(b, 1, 16, 20, n_feats)).astype(np.float32))
        k4 = np.eye(4, dtype=np.float32)
        k4[:3, :3] = [[20, 0, 10], [0, 20, 8], [0, 0, 1]]
        intr = jnp.asarray(k4)[None, None]
        ext = jnp.eye(4)[None, None]
        cam_dirs = jnp.asarray(rng.normal(size=(b, 1, r, 3)).astype(np.float32))

        class Field(nn.Module):
            @nn.compact
            def __call__(self, world, cam_dirs):
                pixel_xy, cam_points = projection.project_points_mv(
                    world, intr, ext)
                feats = gather_projection_features(imgs, feats_img, pixel_xy)
                dirs = jnp.broadcast_to(cam_dirs[:, :, :, None, :],
                                        (b, 1, r, s, 3))
                flat = lambda x: x.reshape((b, r, s, x.shape[-1]))
                emb = MVResNetMLPEmbedding(
                    n_blocks=n_blocks, hidden_size=hidden, n_views=1,
                    embed_direction_vector=True, name="mlp")(
                        flat(cam_points[..., :3]), flat(dirs), flat(feats))
                return RenderReadout(4, name="ro")(emb)

        field = Field()
        with jax.default_matmul_precision("highest"):
            params = field.init(jax.random.PRNGKey(0), world,
                                cam_dirs)["params"]
            want_c, want_d = field.apply({"params": params}, world, cam_dirs)

        from tcnerf.models.fused import flatten_mv_params
        pd = 120
        k0 = params["mlp"]["layer_0"]["kernel"]
        b0 = params["mlp"]["layer_0"]["bias"]
        flat_w = tuple(flatten_mv_params(params["mlp"], n_blocks,
                                         params["ro"])[2:])
        with jax.default_matmul_precision("highest"):
            combined = jnp.concatenate([imgs, feats_img], axis=-1)[0, 0]
            img_p = combined @ k0[pd:]
            grouped, w_pad, w_groups = prepare_image(img_p, ka=4)
            got_c, got_d, _ = swg_field(
                (k0[:pd], b0, flat_w), world, z, cam_dirs, grouped, w_pad,
                w_groups, (16, 20), intr, ext, n_blocks, ka=4, bq=64,
                fast=False, interpret=True)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                                   rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("fast", [False, True])
    def test_swg_rows_patch_repair(self, rng, fast):
        """Block-level overflow repair (swg_rows patch_cap): a geometry where
        a few sorted subgroups overflow their windows must still take the
        kernel path (overflowed=False), with the overflowed queries repaired
        exactly — matching the plain XLA 4-tap gather + chain. patch_cap=0
        must restore the strict whole-call fallback (overflowed=True)."""
        from tcnerf.ops.pallas.swg import prepare_image, swg_rows

        h, w, n_blocks = 16, 250, 2
        img, head_k, head_b, flat = self._setup(rng, h, w, n_blocks)
        # 3968 queries dense in image rows [0, 4) (narrow sorted spans) +
        # 128 scattered over the whole image: the scattered ones sort into
        # the tail subgroups whose spans blow past the ka=4 window
        n_dense, n_sparse = 3968, 128
        xs = np.concatenate([rng.uniform(0, w - 1, n_dense),
                             rng.uniform(0, w - 1, n_sparse)])
        ys = np.concatenate([rng.uniform(0, 3.0, n_dense),
                             rng.uniform(4.0, h - 1, n_sparse)])
        n = n_dense + n_sparse
        coords = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

        grouped, w_pad, w_groups = prepare_image(img, ka=4)
        with jax.default_matmul_precision("highest"):
            out, ov = swg_rows(grouped, w_pad, w_groups, w, h, coords, pos,
                               dirs, head_k, head_b, flat, n_blocks, ka=4,
                               bq=512, sg=4 if fast else 1, fast=fast,
                               patch_cap=1024, interpret=True)
            assert not bool(ov), "patch repair must absorb the overflow"
            _, ov_strict = swg_rows(grouped, w_pad, w_groups, w, h, coords,
                                    pos, dirs, head_k, head_b, flat,
                                    n_blocks, ka=4, bq=512,
                                    sg=4 if fast else 1, fast=fast,
                                    patch_cap=0, interpret=True)
            assert bool(ov_strict), "strict mode must report the overflow"
            ref = self._reference(img, head_k, head_b, flat, n_blocks,
                                  coords, pos, dirs)
        scale = float(jnp.max(jnp.abs(ref)))
        tol = 2e-2 if fast else 1e-3
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=tol * scale, rtol=tol)

    def test_render_chunk_reports_overflow(self, rng):
        """Overflow observability (swg_render_chunk's n_overflow counter): a
        geometry whose sorted keys span more than the window must report the
        fallback; widening the window to cover the whole image must not."""
        from tcnerf.models.fused import swg_prepare, swg_render_chunk
        from tcnerf.models.renderer import MVNeRFRenderer

        h, w, n_rays, n_samples = 16, 20, 32, 8
        model = MVNeRFRenderer(
            n_views=1, n_samples=n_samples, n_features=8, near=0.3, far=1.3,
            original_image_size=(h, w), fusion="without", n_blocks=2,
            hidden_size=128)
        src_images = jnp.asarray(
            rng.uniform(size=(1, 1, h, w, 3)).astype(np.float32))
        feats = jnp.asarray(
            rng.normal(size=(1, 1, h, w, 8)).astype(np.float32))
        k4 = np.eye(4, dtype=np.float32)
        k4[:3, :3] = [[20, 0, 10], [0, 20, 8], [0, 0, 1]]
        intr = jnp.asarray(k4)[None, None]
        ext = jnp.eye(4)[None, None].astype(jnp.float32)
        ray_o = jnp.zeros((1, n_rays, 3))
        ray_d = jnp.asarray(
            rng.normal(size=(1, n_rays, 3)).astype(np.float32))
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)},
            ray_o, ray_d, src_images, intr, ext, feats,
            method="render_rays")["params"]

        prepared = swg_prepare(params, src_images, feats, n_blocks=2, ka=16)
        # one 512-query block spanning the whole 16x128-row padded image
        # overflows a 4-group (512-row) window (patch_cap=0: strict
        # whole-call fallback reporting, no block-level repair) ...
        out = swg_render_chunk(prepared, ray_o, ray_d, intr, ext,
                               jax.random.PRNGKey(2), n_samples=n_samples,
                               n_blocks=2, ka=4, bq=512, sg=1, patch_cap=0,
                               interpret=True)
        assert int(out[4]) > 0
        # ... and fits a 16-group (2048-row) window
        out = swg_render_chunk(prepared, ray_o, ray_d, intr, ext,
                               jax.random.PRNGKey(2), n_samples=n_samples,
                               n_blocks=2, ka=16, bq=512, sg=1,
                               interpret=True)
        assert int(out[4]) == 0

    def test_render_chunk_bf16_prepare_matches_f32(self, rng):
        """Serving downcast (models/inference.py): for f32 models the swg
        path prepares in bf16 (f32 window blocks exceed the scoped-vmem
        limit at the tuned geometry). The bf16-prepared chunk render must
        track the f32-prepared render within bf16-stream tolerance — this
        is exactly the training-validation configuration (render_view on an
        f32 training model)."""
        from tcnerf.models.fused import swg_prepare, swg_render_chunk
        from tcnerf.models.renderer import MVNeRFRenderer

        h, w, n_rays, n_samples = 16, 20, 16, 8
        model = MVNeRFRenderer(
            n_views=1, n_samples=n_samples, n_features=8, near=0.3, far=1.3,
            original_image_size=(h, w), fusion="without", n_blocks=2,
            hidden_size=128)
        src_images = jnp.asarray(
            rng.uniform(size=(1, 1, h, w, 3)).astype(np.float32))
        feats = jnp.asarray(
            rng.normal(size=(1, 1, h, w, 8)).astype(np.float32))  # f32 model
        k4 = np.eye(4, dtype=np.float32)
        k4[:3, :3] = [[20, 0, 10], [0, 20, 8], [0, 0, 1]]
        intr = jnp.asarray(k4)[None, None]
        ext = jnp.eye(4)[None, None].astype(jnp.float32)
        # rays through real pixels so samples project inside the image
        tgt = jnp.asarray([[0.5, 0.4, -0.8]], jnp.float32)
        ray_o = jnp.tile(tgt[None], (1, n_rays, 1))
        px = rng.uniform(2, w - 3, n_rays).astype(np.float32)
        py = rng.uniform(2, h - 3, n_rays).astype(np.float32)
        d = np.stack([(px - 10) / 20, (py - 8) / 20, np.ones(n_rays)], -1)
        ray_d = jnp.asarray(d[None].astype(np.float32))
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)},
            ray_o, ray_d, src_images, intr, ext, feats,
            method="render_rays")["params"]

        kw = dict(n_samples=n_samples, n_blocks=2, ka=16, bq=512, sg=1,
                  interpret=True)
        key = jax.random.PRNGKey(3)
        with jax.default_matmul_precision("highest"):
            p32 = swg_prepare(params, src_images, feats, n_blocks=2, ka=16)
            ref = swg_render_chunk(p32, ray_o, ray_d, intr, ext, key, **kw)
            p16 = swg_prepare(params, src_images, feats, n_blocks=2, ka=16,
                              dtype=jnp.bfloat16)
            got = swg_render_chunk(p16, ray_o, ray_d, intr, ext, key, **kw)
        assert int(got[4]) == 0 and int(ref[4]) == 0
        for a, b in zip(got[:4], ref[:4]):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=3e-2, atol=2e-2)


class TestWindowChooser:
    def test_choose_swg_windows_tracks_baseline(self):
        """choose_swg_windows (models/inference.py): window width must track
        the source/target baseline — a wide-baseline pair on the capture arc
        needs wider sorted windows than an adjacent pair (measured: fine
        ka=4 strands ~35k queries/chunk past the patch capacity at ~47°
        separation, silently putting every render chunk on the ~3x exact
        fallback), and results are cached per pair."""
        from tcnerf.data.synthetic import camera_ring
        from tcnerf.models.inference import choose_swg_windows

        cfgs = camera_ring(16, azimuth_span=np.deg2rad(100))

        def pair(si, ti):
            src, tgt = cfgs[si], cfgs[ti]
            return (src["intrinsics"].reshape(3, 3).astype(np.float32),
                    np.linalg.inv(src["pose"]).astype(np.float32),
                    tgt["pose"].astype(np.float32),
                    tgt["intrinsics"].reshape(3, 3).astype(np.float32))

        args = (480, 640, 0.55, 1.8, 64, 8192)
        wide = choose_swg_windows(*pair(5, 12), *args)
        adj = choose_swg_windows(*pair(5, 6), *args)
        assert wide[0] >= 6, f"wide baseline must widen fine windows: {wide}"
        assert adj[0] <= wide[0], (adj, wide)
        assert all(4 <= k <= 16 for k in wide + adj)
        # cache: same pair returns the identical tuple without recompute
        assert choose_swg_windows(*pair(5, 12), *args) == wide

    def test_derive_window_knobs_tracks_baseline(self):
        """derive_window_knobs (models/fused.py): the ray-batch variant of
        the chooser — used by the bench's TCNERF_BENCH_KA=auto mode — must
        widen windows with the source/target baseline exactly like the
        raster chooser, on arbitrary (non-raster) ray batches."""
        from tcnerf.core.rays import get_specific_rays
        from tcnerf.data.synthetic import camera_ring
        from tcnerf.models.fused import derive_window_knobs

        cfgs = camera_ring(16, azimuth_span=np.deg2rad(100))
        rng = np.random.default_rng(0)
        pix_x = rng.uniform(0, 639, 8192).astype(np.float32)
        pix_y = rng.uniform(0, 479, 8192).astype(np.float32)

        def knobs(si, ti):
            src, tgt = cfgs[si], cfgs[ti]
            ro, rd = get_specific_rays(pix_x, pix_y, tgt["pose"],
                                       tgt["intrinsics"].reshape(3, 3))
            k4 = np.eye(4, dtype=np.float32)
            k4[:3, :3] = src["intrinsics"].reshape(3, 3)
            return derive_window_knobs(
                ro, rd, k4, np.linalg.inv(src["pose"]), (480, 640),
                n_samples=64, near=0.55, far=1.8)

        wide = knobs(5, 12)
        adj = knobs(5, 6)
        assert 2 <= adj["ka"] <= wide["ka"] <= 16, (adj, wide)
        assert 2 <= adj["ka_c"] <= 16 and 2 <= wide["ka_c"] <= 16
        # the probe's expected overflow must sit inside the repair budget
        assert adj["stats"]["fine_expected_overflow_q"] <= 8192 // 2
