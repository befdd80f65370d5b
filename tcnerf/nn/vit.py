"""Vision Transformer (ViT-B/16) with hooked hidden states + DPT-style decoder.

Behavior parity with reference src/lib/mvnerf/layers.py:60-229. Deliberate
rationalizations (documented divergences):
  * the reference's first block norm is a keras BatchNormalization holding
    torch *LayerNorm* weights (layers.py:76, a conversion artifact whose
    inference path is broken at init — zero moving variance,
    nerf_utils.py:232-233). We use true LayerNorm, which is faithful to the
    torch ViT the weights come from; `norm1_batchstat=True` restores the
    batch-statistics behavior the reference effectively trained with.
  * attention uses jax.nn.dot_product_attention (XLA flash attention on TPU)
    instead of keras MultiHeadAttention.

All shapes are static; the token count is 1 + (H/patch)*(W/patch).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import BatchStatNorm


class PatchEmbed(nn.Module):
    patch_size: int = 16
    embed_dim: int = 768
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        return nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                       dtype=self.dtype, name="proj")(x)


class TransformerBlock(nn.Module):
    num_heads: int = 12
    embed_dim: int = 768
    mlp_ratio: int = 4
    norm1_batchstat: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs):
        if self.norm1_batchstat:
            x = BatchStatNorm(dtype=self.dtype, name="norm_1")(inputs)
        else:
            # eps matches torch.nn.LayerNorm (1e-5), the origin of the
            # imported ViT weights (tests/test_import_numerical.py)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="norm_1")(inputs)
        head_dim = self.embed_dim // self.num_heads
        b, t, _ = x.shape
        q = nn.DenseGeneral((self.num_heads, head_dim), dtype=self.dtype, name="q")(x)
        k = nn.DenseGeneral((self.num_heads, head_dim), dtype=self.dtype, name="k")(x)
        v = nn.DenseGeneral((self.num_heads, head_dim), dtype=self.dtype, name="v")(x)
        attn = jax.nn.dot_product_attention(q, k, v)
        attn = nn.DenseGeneral(self.embed_dim, axis=(-2, -1), dtype=self.dtype,
                               name="attn_out")(attn)
        x = inputs + attn
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_2")(x)
        y = nn.Dense(self.embed_dim * self.mlp_ratio, dtype=self.dtype, name="mlp_0")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.embed_dim, dtype=self.dtype, name="mlp_1")(y)
        # Reference residual quirk (layers.py:88-95): the second residual adds the
        # *block input*, not the post-attention stream. Reproduced for parity.
        return inputs + y


class VisionTransformer(nn.Module):
    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    embed_dim: int = 768
    mlp_ratio: int = 4
    num_heads: int = 12
    hooks: Sequence[int] = (3, 6, 9, 12)
    norm1_batchstat: bool = False
    dtype: Optional[jnp.dtype] = None

    @property
    def grid_size(self):
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @nn.compact
    def __call__(self, images):
        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       name="patch_embed")(images)
        b = x.shape[0]
        x = x.reshape(b, -1, self.embed_dim)
        n_tokens = x.shape[1] + 1
        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        pos_embedding = self.param(
            "pos_embedding",
            lambda key, shape: 0.02 * jax.random.normal(key, shape),
            (1, n_tokens, self.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)), x],
                            axis=1)
        x = x + pos_embedding

        features = []
        block_idx = 0
        prev = 0
        for hook in self.hooks:
            for _ in range(hook - prev):
                x = TransformerBlock(self.num_heads, self.embed_dim, self.mlp_ratio,
                                     norm1_batchstat=self.norm1_batchstat,
                                     dtype=self.dtype, name=f"block_{block_idx}")(x)
                block_idx += 1
            prev = hook
            features.append(x)
        return x, features


class VisionTransformerEncoder(nn.Module):
    """DPT-style decoder over 4 hooked ViT feature maps (reference layers.py:155-229)."""

    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    embed_dim: int = 768
    n_features: int = 256
    mlp_ratio: int = 4
    num_heads: int = 12
    hooks: Sequence[int] = (3, 6, 9, 12)
    features: Sequence[int] = (48, 96, 192, 384)
    norm1_batchstat: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images):
        vit = VisionTransformer(self.img_size, self.patch_size, self.embed_dim,
                                self.mlp_ratio, self.num_heads, self.hooks,
                                norm1_batchstat=self.norm1_batchstat,
                                dtype=self.dtype, name="vit")
        _, feats = vit(images)
        gh, gw = vit.grid_size
        maps = [f[:, 1:].reshape(f.shape[0], gh, gw, self.embed_dim) for f in feats]

        # post-process pyramid: strides 1/4, 1/2, 1, 2 relative to the token grid
        f0 = nn.Conv(self.features[0], (1, 1), dtype=self.dtype, name="pp1_conv")(maps[0])
        f0 = nn.ConvTranspose(self.features[0], (4, 4), strides=(4, 4),
                              dtype=self.dtype, name="pp1_deconv")(f0)
        f1 = nn.Conv(self.features[1], (1, 1), dtype=self.dtype, name="pp2_conv")(maps[1])
        f1 = nn.ConvTranspose(self.features[1], (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="pp2_deconv")(f1)
        f2 = nn.Conv(self.features[2], (1, 1), dtype=self.dtype, name="pp3_conv")(maps[2])
        f3 = nn.Conv(self.features[3], (1, 1), dtype=self.dtype, name="pp4_conv")(maps[3])
        f3 = nn.Conv(self.features[3], (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.dtype, name="pp4_down")(f3)

        def decode_up(f, scale, name):
            f = nn.Conv(self.n_features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=name)(f)
            target = (f.shape[0], f.shape[1] * scale, f.shape[2] * scale, f.shape[3])
            return jax.image.resize(f, target, method="bilinear")

        latents = jnp.concatenate([
            decode_up(f0, 2, "decode_1"),
            decode_up(f1, 4, "decode_2"),
            decode_up(f2, 8, "decode_3"),
            decode_up(f3, 16, "decode_4"),
        ], axis=-1)

        x = nn.relu(latents)
        x = nn.Conv(self.n_features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="out_conv_1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.n_features // 2, (3, 3), padding="SAME", dtype=self.dtype,
                    name="out_conv_2")(x)
        return x


class VisualFeatures(nn.Module):
    """Full-image encoder: ViT path (downscaled to vit_size, decoded, upscaled to
    half original size) concatenated with the conv path (reference layers.py:232-259).

    Output: [B, H/2, W/2, n_features].
    """

    n_features: int = 256
    original_image_size: Tuple[int, int] = (480, 640)
    vit_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    embed_dim: int = 768
    num_heads: int = 12
    hooks: Sequence[int] = (3, 6, 9, 12)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images):
        from .conv import ConvolutionalEncoder  # local to avoid cycle

        b = images.shape[0]
        vit_in = jax.image.resize(
            images, (b, self.vit_size[0], self.vit_size[1], images.shape[-1]),
            method="bilinear",
        )
        latents = VisionTransformerEncoder(
            img_size=self.vit_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, n_features=self.n_features,
            num_heads=self.num_heads, hooks=self.hooks, dtype=self.dtype,
            name="vision_transformer")(vit_in)
        half = (b, self.original_image_size[0] // 2, self.original_image_size[1] // 2,
                latents.shape[-1])
        latents = jax.image.resize(latents, half, method="bilinear")
        skip = ConvolutionalEncoder(self.n_features, dtype=self.dtype,
                                    name="conv_features")(images)
        return jnp.concatenate([latents, skip], axis=-1)
