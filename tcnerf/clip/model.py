"""CLIP RN50 image tower and text transformer in flax (frozen feature extractors).

The reference loads a pre-converted TF SavedModel of OpenAI CLIP RN50 from a
hard-coded disk path and wraps it frozen (src/lib/clip/model.py:5-37);
`encode_image` returns a 5-tuple (global 1024-d embedding + the four residual
stage activations 56x56x256 / 28x28x512 / 14x14x1024 / 7x7x2048, shapes pinned
at src/lib/mvnerf/layers.py:550-558) and `encode_text` returns 1024-d. This is
a native JAX reimplementation of the same architecture (OpenAI's
ModifiedResNet + causal text transformer); weights import from the public
torch state dict via tcnerf.clip.import_torch, or random-init for
training-from-scratch/testing.

Frozen-model notes: all BatchNorms use stored running statistics as plain
parameters (no mutable state), matching inference-mode CLIP. The params tree
is excluded from optimization by the 'frozen' group in the trainers.

TPU notes: attention uses jax.nn.dot_product_attention (flash path);
convolutions are XLA NHWC convs; everything jits into the surrounding model.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .tokenizer import VOCAB_SIZE


class FrozenBatchNorm(nn.Module):
    """Inference-mode BN: running mean/var live in params (loaded, never updated)."""

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return x * inv + (bias - mean * inv)


class Bottleneck(nn.Module):
    """CLIP's anti-aliased bottleneck (avgpool before strided convs)."""

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(out))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride),
                              strides=(self.stride, self.stride))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)

        if self.stride > 1 or x.shape[-1] != self.planes * self.expansion:
            identity = nn.avg_pool(x, (self.stride, self.stride),
                                   strides=(self.stride, self.stride)) \
                if self.stride > 1 else x
            identity = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(identity)
            identity = FrozenBatchNorm(dtype=self.dtype,
                                       name="downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    num_heads: int = 32
    output_dim: int = 1024
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, HW+1, C]
        pos = self.param("positional_embedding",
                         lambda k, s: jax.random.normal(k, s) / c ** 0.5,
                         (h * w + 1, c))
        tokens = tokens + pos[None]
        head_dim = c // self.num_heads
        q = nn.DenseGeneral((self.num_heads, head_dim), dtype=self.dtype,
                            name="q")(tokens[:, :1])
        k = nn.DenseGeneral((self.num_heads, head_dim), dtype=self.dtype,
                            name="k")(tokens)
        v = nn.DenseGeneral((self.num_heads, head_dim), dtype=self.dtype,
                            name="v")(tokens)
        attn = jax.nn.dot_product_attention(q, k, v)
        out = nn.DenseGeneral(self.output_dim, axis=(-2, -1), dtype=self.dtype,
                              name="out")(attn)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    """CLIP RN50 visual tower with pyramid taps."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        w = self.width
        # 3-conv anti-aliased stem
        x = nn.Conv(w // 2, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv1")(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="stem_bn1")(x))
        x = nn.Conv(w // 2, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv2")(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="stem_bn2")(x))
        x = nn.Conv(w, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv3")(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="stem_bn3")(x))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        taps = []
        for stage, (n_blocks, planes, stride) in enumerate(
                zip(self.layers, (w, w * 2, w * 4, w * 8), (1, 2, 2, 2))):
            for i in range(n_blocks):
                x = Bottleneck(planes, stride if i == 0 else 1, dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(x)
            taps.append(x)

        embedding = AttentionPool2d(self.heads, self.output_dim, dtype=self.dtype,
                                    name="attnpool")(x)
        return (embedding, taps[0], taps[1], taps[2], taps[3])


class TextTransformerBlock(nn.Module):
    width: int = 512
    heads: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(dtype=self.dtype, name="ln_1")(x)
        head_dim = self.width // self.heads
        q = nn.DenseGeneral((self.heads, head_dim), dtype=self.dtype, name="q")(h)
        k = nn.DenseGeneral((self.heads, head_dim), dtype=self.dtype, name="k")(h)
        v = nn.DenseGeneral((self.heads, head_dim), dtype=self.dtype, name="v")(h)
        attn = jax.nn.dot_product_attention(q, k, v, mask=mask)
        h = nn.DenseGeneral(self.width, axis=(-2, -1), dtype=self.dtype,
                            name="attn_out")(attn)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(h)
        h = h * nn.sigmoid(1.702 * h)  # QuickGELU (CLIP's activation)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class TextTransformer(nn.Module):
    """CLIP text tower: causal transformer -> EOT feature -> 1024-d projection."""

    vocab_size: int = VOCAB_SIZE
    context_length: int = 77
    width: int = 512
    heads: int = 8
    n_layers: int = 12
    output_dim: int = 1024
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens):
        emb = nn.Embed(self.vocab_size, self.width,
                       embedding_init=nn.initializers.normal(0.02),
                       name="token_embedding")(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = emb + pos[None]
        t = tokens.shape[1]
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        for i in range(self.n_layers):
            x = TextTransformerBlock(self.width, self.heads, dtype=self.dtype,
                                     name=f"block_{i}")(x, causal)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the largest token id
        feats = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim))
        return feats @ proj


class CLIPVisualEncoder(nn.Module):
    """Frozen RN50 image tower (reference src/lib/clip/model.py:21-27).

    Size knobs default to RN50; tests shrink them.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images):
        return ModifiedResNet(layers=self.layers, width=self.width,
                              output_dim=self.output_dim, heads=self.heads,
                              dtype=self.dtype, name="visual")(images)


class CLIPTextualEncoder(nn.Module):
    """Frozen text tower (reference src/lib/clip/model.py:30-37)."""

    width: int = 512
    heads: int = 8
    n_layers: int = 12
    output_dim: int = 1024
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens):
        return TextTransformer(width=self.width, heads=self.heads,
                               n_layers=self.n_layers,
                               output_dim=self.output_dim,
                               dtype=self.dtype, name="text")(tokens)
