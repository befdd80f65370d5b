"""CLIP-pyramid x visual-feature fusion decoders (variants V0..V4).

Behavior parity with reference src/lib/mvnerf/layers.py:414-660 (V3/V4 and
their building blocks) and src/lib/mvnerf/legacy_layers.py (V0/V1/V2).

All variants consume:
  clip_outputs = (global_embed [N,1024], l1 [N,h1,w1,256], l2 [N,h2,w2,512],
                  l3 [N,h3,w3,1024], l4 [N,h4,w4,2048])
  visual_features [N, H/2, W/2, 256]
  clip_textuals [N, 1024] (V3/V4 FiLM gates; a ones-vector placeholder in the
  pure-NeRF models, reference model_v3.py:82-84)
and emit a fused [N, H, W, 256] feature image. Sizes are derived from the
visual-feature map so reduced-resolution test configs work unchanged.

V2 additionally returns an auxiliary self-reconstruction CE loss (reference
legacy_layers.py:100-102); other variants return 0.0 for a uniform interface.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


class DoubleConv(nn.Module):
    filters: int
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = nn.relu if self.activation == "relu" else nn.elu
        x = act(nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv_1")(x))
        x = act(nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv_2")(x))
        return x


class Up(nn.Module):
    """Upsample 2x, concat a resized CLIP level, double conv (layers.py:437-456)."""

    shape: Tuple[int, int]
    filters: int
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, clip_x):
        x = _resize(x, x.shape[1] * 2, x.shape[2] * 2)
        clip_x = _resize(clip_x, self.shape[0], self.shape[1])
        x = jnp.concatenate([x, clip_x], axis=-1)
        return DoubleConv(self.filters, self.activation, dtype=self.dtype,
                          name="double_conv")(x)


class ConvFusion(nn.Module):
    """concat -> act -> 1x1 conv (layers.py:459-477)."""

    filters: int
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1, x2):
        act = nn.relu if self.activation == "relu" else nn.elu
        x = act(jnp.concatenate([x1, x2], axis=-1))
        return nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                       name="conv")(x)


class MultiplyFusion(nn.Module):
    """FiLM-style channelwise gate by the projected text embedding (layers.py:480-508)."""

    filters: int
    use_dense: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, clip_textuals):
        if self.use_dense:
            t = nn.Dense(self.filters, use_bias=False, dtype=self.dtype,
                         name="tile_dense")(clip_textuals)
        else:
            t = clip_textuals[:, : self.filters]  # reference Slice layer
        return x * t[:, None, None, :]


class _UNetFusion(nn.Module):
    """Shared body of V3/V4; V4 narrows up_3 to 128 channels (layers.py:615)."""

    up3_filters: int
    use_dense: bool = False
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, clip_outputs, visual_features, clip_textuals):
        act = nn.relu if self.activation == "relu" else nn.elu
        _, clip_l1, clip_l2, clip_l3, clip_l4 = clip_outputs
        vh, vw = visual_features.shape[1], visual_features.shape[2]
        vis_1 = _resize(visual_features, vh // 2, vw // 2)
        vis_2 = _resize(visual_features, vh // 4, vw // 4)

        x = act(nn.Conv(1024, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv")(_resize(clip_l4, vh // 8, vw // 8)))
        x = MultiplyFusion(1024, self.use_dense, dtype=self.dtype,
                           name="multiply_fusion_1")(x, clip_textuals)
        x = Up((vh // 4, vw // 4), 512, self.activation, dtype=self.dtype,
               name="up_1")(x, clip_l3)
        x = MultiplyFusion(512, self.use_dense, dtype=self.dtype,
                           name="multiply_fusion_2")(x, clip_textuals)
        x = ConvFusion(512, self.activation, dtype=self.dtype,
                       name="conv_fusion_1")(x, vis_2)
        x = Up((vh // 2, vw // 2), 256, self.activation, dtype=self.dtype,
               name="up_2")(x, clip_l2)
        x = MultiplyFusion(256, self.use_dense, dtype=self.dtype,
                           name="multiply_fusion_3")(x, clip_textuals)
        x = ConvFusion(256, self.activation, dtype=self.dtype,
                       name="conv_fusion_2")(x, vis_1)
        x = Up((vh, vw), self.up3_filters, self.activation, dtype=self.dtype,
               name="up_3")(x, clip_l1)
        x = ConvFusion(256, self.activation, dtype=self.dtype,
                       name="conv_fusion_3")(x, visual_features)
        x = _resize(x, vh * 2, vw * 2)
        return x, jnp.array(0.0, dtype=x.dtype)


class CombineCLIPVisualV3(_UNetFusion):
    up3_filters: int = 256


class CombineCLIPVisualV4(_UNetFusion):
    up3_filters: int = 128


class Level(nn.Module):
    """Legacy per-scale fusion (legacy_layers.py:4-33)."""

    downscale: int
    filters: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, clip_x, vis):
        vh, vw = vis.shape[1], vis.shape[2]
        dh, dw = vh // self.downscale, vw // self.downscale
        clip_x = _resize(
            nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pre_conv")(clip_x), dh, dw)
        vis = _resize(vis, dh, dw)
        x = jnp.concatenate([clip_x, vis], axis=-1)
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="post_conv")(x)
        return _resize(x, vh, vw)


class CombineCLIPVisualV0(nn.Module):
    """resize CLIP layer1 + concat + 1x1 conv + upsample (legacy_layers.py:158-191)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, clip_outputs, visual_features, clip_textuals=None):
        vh, vw = visual_features.shape[1], visual_features.shape[2]
        clip_l1 = _resize(clip_outputs[1], vh, vw)
        x = jnp.concatenate([clip_l1, visual_features], axis=-1)
        x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
        return _resize(x, vh * 2, vw * 2), jnp.array(0.0, dtype=x.dtype)


class CombineCLIPVisualV1(nn.Module):
    """4-level concat fusion (legacy_layers.py:107-155)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, clip_outputs, visual_features, clip_textuals=None):
        vh, vw = visual_features.shape[1], visual_features.shape[2]
        levels = [
            Level(2 ** i, dtype=self.dtype, name=f"level_{i + 1}")(
                clip_outputs[i + 1], visual_features)
            for i in range(4)
        ]
        x = jnp.concatenate(levels, axis=-1)
        x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
        return _resize(x, vh * 2, vw * 2), jnp.array(0.0, dtype=x.dtype)


class CombineCLIPVisualV2(nn.Module):
    """V1 + auxiliary CLIP self-reconstruction CE loss (legacy_layers.py:53-104)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, clip_outputs, visual_features, clip_textuals=None):
        vh, vw = visual_features.shape[1], visual_features.shape[2]
        levels = [
            Level(2 ** i, dtype=self.dtype, name=f"level_{i + 1}")(
                clip_outputs[i + 1], visual_features)
            for i in range(4)
        ]
        x = jnp.concatenate(levels, axis=-1)
        x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)

        # CLIPFeatureExtraction: 2x2 max pool grid over the fused map -> 1024 vec
        ph, pw = vh // 2, vw // 2
        pooled = nn.max_pool(x, window_shape=(ph, pw), strides=(ph, pw), padding="VALID")
        pred = pooled.reshape(pooled.shape[0], -1)
        aux = _categorical_crossentropy(clip_outputs[0], pred)
        return _resize(x, vh * 2, vw * 2), aux


def _categorical_crossentropy(y_true, y_pred, eps: float = 1e-7):
    """keras CategoricalCrossentropy(from_logits=False) semantics."""
    p = y_pred / jnp.clip(jnp.sum(y_pred, axis=-1, keepdims=True), eps)
    p = jnp.clip(p, eps, 1.0 - eps)
    return -jnp.mean(jnp.sum(y_true * jnp.log(p), axis=-1))
