"""Torch-weight importers.

Two bootstrap paths mirror the reference:
  * OpenAI CLIP RN50 state dict -> flax params for ModifiedResNet +
    TextTransformer (the reference instead loads a pre-converted TF SavedModel
    from disk, src/lib/clip/model.py:5-8);
  * timm/DPT ViT-B pickled state dict -> params for
    tcnerf.nn.vit.VisionTransformer (reference load_pretrained_weights,
    src/lib/mvnerf/nerf_utils.py:179-274 — note that converter writes torch
    LayerNorm weights into a keras BatchNorm with zeroed moving stats; here
    they land in a true LayerNorm, faithful to the source network).

Inputs are dicts of numpy arrays (or torch tensors; `.numpy()` is taken).
Outputs are nested flax param dicts that tree-match the random-init trees.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch.save state-dict archive (weights only; no pickled code)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: _np(v) for k, v in obj.items()}


def _conv(w):
    return {"kernel": _np(w).transpose(2, 3, 1, 0)}


def _conv_b(w, b):
    return {"kernel": _np(w).transpose(2, 3, 1, 0), "bias": _np(b)}


def _bn(sd, prefix):
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _dense(w, b=None):
    out = {"kernel": _np(w).T}
    if b is not None:
        out["bias"] = _np(b)
    return out


def _heads_in(w, b, n_heads):
    """torch [out=H*D, in=C] -> DenseGeneral kernel [C, H, D] (+ bias [H, D])."""
    w = _np(w)
    c = w.shape[1]
    h = n_heads
    d = w.shape[0] // h
    return {"kernel": w.T.reshape(c, h, d), "bias": _np(b).reshape(h, d)}


def _heads_out(w, b, n_heads):
    """torch [out=C, in=H*D] -> DenseGeneral kernel [H, D, C] (+ bias [C])."""
    w = _np(w)
    c_out = w.shape[0]
    h = n_heads
    d = w.shape[1] // h
    return {"kernel": w.T.reshape(h, d, c_out), "bias": _np(b)}


# ------------------------------------------------------------------- CLIP RN50

def import_clip_rn50_visual(sd: Dict[str, np.ndarray],
                            layers=(3, 4, 6, 3), heads: int = 32) -> Dict:
    """state dict (keys 'visual.*') -> params for clip.model.ModifiedResNet."""
    p = {}
    for i in (1, 2, 3):
        p[f"stem_conv{i}"] = _conv(sd[f"visual.conv{i}.weight"])
        p[f"stem_bn{i}"] = _bn(sd, f"visual.bn{i}")
    for stage, n_blocks in enumerate(layers):
        for i in range(n_blocks):
            pre = f"visual.layer{stage + 1}.{i}"
            block = {
                "conv1": _conv(sd[f"{pre}.conv1.weight"]),
                "bn1": _bn(sd, f"{pre}.bn1"),
                "conv2": _conv(sd[f"{pre}.conv2.weight"]),
                "bn2": _bn(sd, f"{pre}.bn2"),
                "conv3": _conv(sd[f"{pre}.conv3.weight"]),
                "bn3": _bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                block["downsample_conv"] = _conv(sd[f"{pre}.downsample.0.weight"])
                block["downsample_bn"] = _bn(sd, f"{pre}.downsample.1")
            p[f"layer{stage + 1}_{i}"] = block
    p["attnpool"] = {
        "positional_embedding": _np(sd["visual.attnpool.positional_embedding"]),
        "q": _heads_in(sd["visual.attnpool.q_proj.weight"],
                       sd["visual.attnpool.q_proj.bias"], heads),
        "k": _heads_in(sd["visual.attnpool.k_proj.weight"],
                       sd["visual.attnpool.k_proj.bias"], heads),
        "v": _heads_in(sd["visual.attnpool.v_proj.weight"],
                       sd["visual.attnpool.v_proj.bias"], heads),
        "out": _heads_out(sd["visual.attnpool.c_proj.weight"],
                          sd["visual.attnpool.c_proj.bias"], heads),
    }
    return {"visual": p}


def import_clip_text(sd: Dict[str, np.ndarray], n_layers: int = 12,
                     heads: int = 8, width: int = 512) -> Dict:
    """state dict -> params for clip.model.TextTransformer."""
    p = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }
    for i in range(n_layers):
        pre = f"transformer.resblocks.{i}"
        in_w = _np(sd[f"{pre}.attn.in_proj_weight"])
        in_b = _np(sd[f"{pre}.attn.in_proj_bias"])
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        p[f"block_{i}"] = {
            "ln_1": _ln(sd, f"{pre}.ln_1"),
            "ln_2": _ln(sd, f"{pre}.ln_2"),
            "q": _heads_in(qw, qb, heads),
            "k": _heads_in(kw, kb, heads),
            "v": _heads_in(vw, vb, heads),
            "attn_out": _heads_out(sd[f"{pre}.attn.out_proj.weight"],
                                   sd[f"{pre}.attn.out_proj.bias"], heads),
            "mlp_fc": _dense(sd[f"{pre}.mlp.c_fc.weight"], sd[f"{pre}.mlp.c_fc.bias"]),
            "mlp_proj": _dense(sd[f"{pre}.mlp.c_proj.weight"],
                               sd[f"{pre}.mlp.c_proj.bias"]),
        }
    return {"text": p}


# ---------------------------------------------------------------------- ViT-B

def import_vit_b(sd: Dict[str, np.ndarray], n_blocks: int = 12,
                 n_heads: int = 12) -> Dict:
    """torch ViT-B state dict ('blocks.N.*' naming) -> params for nn.vit.VisionTransformer.

    Reference converter: nerf_utils.py:179-274 (qkv split + transposes).
    """
    p = {
        "cls_token": _np(sd["cls_token"]).reshape(1, 1, -1),
        "pos_embedding": _np(sd["pos_embed"]),
        "patch_embed": {"proj": _conv_b(sd["patch_embed.proj.weight"],
                                        sd["patch_embed.proj.bias"])},
    }
    for i in range(n_blocks):
        pre = f"blocks.{i}"
        qkv_w = _np(sd[f"{pre}.attn.qkv.weight"])
        qkv_b = _np(sd[f"{pre}.attn.qkv.bias"])
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        p[f"block_{i}"] = {
            "norm_1": _ln(sd, f"{pre}.norm1"),
            "norm_2": _ln(sd, f"{pre}.norm2"),
            "q": _heads_in(qw, qb, n_heads),
            "k": _heads_in(kw, kb, n_heads),
            "v": _heads_in(vw, vb, n_heads),
            "attn_out": _heads_out(sd[f"{pre}.attn.proj.weight"],
                                   sd[f"{pre}.attn.proj.bias"], n_heads),
            "mlp_0": _dense(sd[f"{pre}.mlp.fc1.weight"], sd[f"{pre}.mlp.fc1.bias"]),
            "mlp_1": _dense(sd[f"{pre}.mlp.fc2.weight"], sd[f"{pre}.mlp.fc2.bias"]),
        }
    return p


def load_pretrained_vit(path: str, params: Dict) -> Dict:
    """Replace the VisionTransformer subtree inside a VisualFeatures param tree.

    Reference entry point: load_pretrained_weights(path, visual_features.
    vision_transformer), src/train_nerf.py:127-132.
    """
    sd = load_state_dict(path)
    vit_params = import_vit_b(sd)
    new = dict(params)
    vf = dict(new["visual_features"])
    vte = dict(vf["vision_transformer"])
    vte["vit"] = vit_params
    vf["vision_transformer"] = vte
    new["visual_features"] = vf
    return new
