"""CLIP sanity demo — image/text similarity logits.

Parity with the reference's standalone script (src/lib/clip/main.py:9-46):
encodes a few images and text prompts with the frozen towers and prints the
softmax similarity matrix. With no weights available the towers are randomly
initialized (documented; logits are then meaningless but the pipeline runs).

Usage: python -m tcnerf.clip.demo [--weights RN50.pt] [--size 64]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights", default=None,
                        help="OpenAI CLIP RN50 torch checkpoint (optional)")
    parser.add_argument("--size", type=int, default=224)
    args = parser.parse_args()

    from .model import CLIPTextualEncoder, CLIPVisualEncoder
    from .preprocess import preprocess
    from .tokenizer import tokenize
    from ..data.synthetic import SyntheticScene, camera_ring

    # render three synthetic scenes as the demo images
    images = []
    for seed in (0, 1, 2):
        scene = SyntheticScene.random(seed, n_spheres=2)
        cfg = camera_ring(1, height=args.size, width=args.size)[0]
        images.append(scene.render(cfg["pose"], cfg["intrinsics"].reshape(3, 3),
                                   args.size, args.size)[..., :3] / 255.0)
    images = jnp.asarray(np.stack(images), jnp.float32)

    texts = ["a red ball on a table", "a green ball on a table",
             "an empty checkered table"]
    tokens = jnp.asarray(tokenize(texts))

    visual = CLIPVisualEncoder()
    textual = CLIPTextualEncoder()
    v_params = visual.init(jax.random.PRNGKey(0),
                           preprocess(images, args.size))["params"]
    t_params = textual.init(jax.random.PRNGKey(1), tokens)["params"]

    if args.weights:
        from .import_torch import (import_clip_rn50_visual, import_clip_text,
                                   load_state_dict)
        sd = load_state_dict(args.weights)
        v_params = import_clip_rn50_visual(sd)
        t_params = import_clip_text(sd)
        print("loaded OpenAI CLIP RN50 weights")
    else:
        print("no weights given — random towers (logits are not meaningful)")

    image_emb = visual.apply({"params": v_params},
                             preprocess(images, args.size))[0]
    text_emb = textual.apply({"params": t_params}, tokens)

    image_emb = image_emb / jnp.linalg.norm(image_emb, axis=-1, keepdims=True)
    text_emb = text_emb / jnp.linalg.norm(text_emb, axis=-1, keepdims=True)
    logits = 100.0 * image_emb @ text_emb.T
    probs = jax.nn.softmax(logits, axis=-1)

    print("label probabilities per image:")
    for i, row in enumerate(np.asarray(probs)):
        print(f"  image {i}: " + "  ".join(
            f"{t!r}: {p:.3f}" for t, p in zip(texts, row)))


if __name__ == "__main__":
    main()
