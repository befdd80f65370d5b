"""CLIP image preprocessing (device-side, static shapes).

Behavior parity with reference preprocess_tf (src/lib/clip/utils.py:25-50),
including its resize quirk: for landscape inputs it resizes to
[height = 224*w/h, width = 224] (axes swapped relative to a standard
shorter-side resize) and then center-crops/pads to 224x224. Operates on
float images in [0, 1] (the reference's normalize=False path) and applies the
CLIP mean/std standardization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess(images: jnp.ndarray, to_size: int = 224) -> jnp.ndarray:
    """[B, H, W, 3] float in [0,1] -> [B, to_size, to_size, 3] standardized."""
    b, h, w, c = images.shape
    if w > h:
        new_h, new_w = int(to_size * w / h), to_size
    else:
        new_h, new_w = to_size, int(to_size * h / w)
    images = jax.image.resize(images, (b, new_h, new_w, c), method="cubic")

    # center crop or pad to (to_size, to_size)
    def _crop_or_pad(x, axis, target):
        size = x.shape[axis]
        if size > target:
            start = (size - target) // 2
            x = jax.lax.slice_in_dim(x, start, start + target, axis=axis)
        elif size < target:
            pad_lo = (target - size) // 2
            pad = [(0, 0)] * x.ndim
            pad[axis] = (pad_lo, target - size - pad_lo)
            x = jnp.pad(x, pad)
        return x

    images = _crop_or_pad(images, 1, to_size)
    images = _crop_or_pad(images, 2, to_size)

    mean = jnp.asarray(CLIP_MEAN, images.dtype)
    std = jnp.asarray(CLIP_STD, images.dtype)
    return (images - mean) / std
