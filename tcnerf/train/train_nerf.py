"""Stage-1 NeRF pretraining entry point.

Parity with reference src/train_nerf.py: Hydra-style CLI
(`python -m tcnerf.train.train_nerf [--config-name=...] key=value ...`),
MultiOptimizer semantics (warmup-Adam 1e-4 on the NeRF MLPs + 1e-5 on the
visual encoder, grad clip +-1), resumable per-component checkpoints, PNG
validation strips of source/GT/render/depth every eval_after_epochs.

The fusion variant comes from cfg.nerf_training.fusion ('v0'..'v4' or
'without'); `train_without` is this entry point pinned to 'without'
(reference src/train_without.py).
"""

from __future__ import annotations

import contextlib
import json
import os
import sys

import jax
import numpy as np

from ..data.generators import MVNeRFDataGenerator
from ..data.loaders import ensure_dataset, load_dataset_nerf
from ..data.prefetch import prefetched_epochs
from ..models import checkpoint as ckpt
from ..models import training as T
from ..models.inference import psnr, render_view
from ..models.renderer import MVNeRFRenderer
from ..utils.logging import logger
from .config import main_config
from .session import init_training_session


def build_model(cfg, fusion=None):
    nm = cfg.nerf_model
    return MVNeRFRenderer(
        n_views=nm.n_views, n_samples=nm.n_samples, n_features=nm.n_features,
        near=nm.near, far=nm.far,
        original_image_size=tuple(nm.original_image_size),
        fusion=fusion or cfg.nerf_training.get("fusion", "v0"),
        n_blocks=nm.get("n_blocks", 6), hidden_size=nm.get("hidden_size", 128),
        vit_size=tuple(nm.get("vit_size", (224, 224))),
        vit_patch=nm.get("vit_patch", 16), vit_dim=nm.get("vit_dim", 768),
        vit_heads=nm.get("vit_heads", 12),
        vit_hooks=tuple(nm.get("vit_hooks", (3, 6, 9, 12))),
        clip_layers=tuple(nm.get("clip_layers", (3, 4, 6, 3))),
        clip_width=nm.get("clip_width", 64),
        clip_embed_dim=nm.get("clip_embed_dim", 1024),
        clip_image_size=nm.get("clip_image_size", 224),
        # language-backbone pretraining sets these to the LanguageNeRF
        # fusion flavor (use_dense=True, elu) so the stage-1 decoder loads
        # into the grasp stage (see MVNeRFRenderer.fusion_use_dense)
        fusion_use_dense=nm.get("fusion_use_dense", False),
        fusion_activation=nm.get("fusion_activation", "relu"),
        # training defaults (overridable via nerf_model.*): remat the MLP
        # chains + encoder so full-scale fwd+bwd fits HBM, and keep the
        # reference-shaped scattered gather — the corner-gather serving
        # optimization materializes a [B, H, W, 4*hidden] corner image PER
        # STAGE (~10 GB at batch 8 f32), which only pays off at
        # serving-scale ray counts (param tree is identical either way)
        corner_gather=nm.get("corner_gather", False),
        remat=nm.get("remat", True),
        pallas_mlp=nm.get("pallas_mlp", False),
        # mixed-precision encoder (bf16 compute, f32 params) — measured
        # speedup knob for the encoder-bound train step; reference parity
        # default is f32
        encoder_dtype=nm.get("encoder_dtype", None),
        # beyond-reference fast per-scene field (nn/hashgrid_field.py);
        # "pixel" = reference parity
        field=nm.get("field", "pixel"),
        hashgrid_levels=nm.get("hashgrid_levels", 16),
        hashgrid_table_log2=nm.get("hashgrid_table_log2", 14),
        hashgrid_hidden=nm.get("hashgrid_hidden", 64),
        hashgrid_layers=nm.get("hashgrid_layers", 3),
        hashgrid_bounds=tuple(tuple(b) for b in nm.get(
            "hashgrid_bounds", ((-0.2, 1.2), (-0.8, 0.8), (-0.4, 1.0)))),
    )


def save_validation_strip(path, src_colors, tgt_color, rendered_rgb,
                          rendered_depth):
    """Side-by-side source/GT/render/depth PNG (reference train_nerf.py:68-81)."""
    from PIL import Image

    parts = [np.asarray(c)[..., :3] for c in src_colors]
    parts.append(np.asarray(tgt_color)[..., :3])
    parts.append(rendered_rgb)
    parts.append(np.repeat(rendered_depth, 3, axis=-1))
    strip = np.concatenate(parts, axis=1)
    Image.fromarray(strip).save(path)


def run_validation(model, variables, valid_data, out_path, rng):
    rendered_rgb, rendered_depth = render_view(
        model, variables, valid_data["src_colors"],
        valid_data["src_camera_configs"], valid_data["tgt_camera_config"],
        rng=rng)
    save_validation_strip(out_path, valid_data["src_colors"],
                          valid_data["tgt_colors"], rendered_rgb, rendered_depth)
    value = psnr(rendered_rgb, np.asarray(valid_data["tgt_colors"])[..., :3])
    logger.info(f"validation PSNR: {value:.2f} dB -> {out_path}")
    return value


def train_model(model, state, data_generator, cfg, valid_data, rng):
    import time

    nt = cfg.nerf_training
    start_epoch, progress_file = init_training_session(nt.model_path)
    n_fits = nt.n_epochs // nt.eval_after_epochs
    start_n_fit = start_epoch // nt.eval_after_epochs
    os.makedirs(os.path.join(nt.model_path, "valid"), exist_ok=True)
    model_checkpoint_name = os.path.join(nt.model_path, "model_final")
    components = (ckpt.RENDERER_WITHOUT_COMPONENTS
                  if model.fusion == "without" else ckpt.RENDERER_COMPONENTS)
    # persistent loss/PSNR curve (append-mode: survives resume) — the
    # convergence evidence artifact (docs/convergence.md)
    metrics_file = os.path.join(nt.model_path, "metrics.jsonl")

    def log_metrics(epoch, loss, psnr_db):
        with open(metrics_file, "a") as f:
            json.dump({"epoch": epoch, "loss": loss, "psnr_db": psnr_db,
                       "t": time.time()}, f)
            f.write("\n")

    if start_epoch == 0:
        value = run_validation(
            model, {"params": state.params}, valid_data,
            os.path.join(nt.model_path, "valid", "valid-0.png"), rng)
        log_metrics(0, None, value)

    # TCNERF_TRACE=<logdir> captures a jax.profiler trace of the first fit
    # round (utils/profiling.py; viewable in TensorBoard/Perfetto)
    trace_dir = os.environ.get("TCNERF_TRACE")

    for k in range(start_n_fit, n_fits):
        e_epoch = (k + 1) * nt.eval_after_epochs
        from ..utils.profiling import trace
        ctx = (trace(trace_dir) if trace_dir and k == start_n_fit
               else contextlib.nullcontext())
        # double-buffered feed: batch synthesis + device_put overlap the step
        with ctx:
            for inputs, labels in prefetched_epochs(data_generator,
                                                    nt.eval_after_epochs):
                rng, step_key = jax.random.split(rng)
                state, metrics = T.nerf_train_step(state, inputs, labels,
                                                   step_key)
        logger.info(f"epoch {e_epoch}: loss {float(metrics['loss']):.5f}")

        value = run_validation(model, {"params": state.params}, valid_data,
                               os.path.join(nt.model_path, "valid",
                                            f"valid-{e_epoch}.png"), rng)
        log_metrics(e_epoch, float(metrics["loss"]), value)
        with open(progress_file, "w") as f:
            json.dump({"epoch": e_epoch}, f)
        ckpt.store(model_checkpoint_name, state.params, components)
        # flavor sidecar: lets load_backbone detect activation-only
        # mismatches the param tree cannot express (ADVICE r3)
        ckpt.store_meta(model_checkpoint_name, {
            "fusion": model.fusion,
            "fusion_use_dense": model.fusion_use_dense,
            "fusion_activation": model.fusion_activation,
            "field": model.field,
        })
    return state


def _main(cfg, fusion=None):
    logger.remove()
    logger.add(sys.stderr, level="INFO")
    nm = cfg.nerf_model

    span = cfg.dataset.get("azimuth_span_deg")
    ensure_dataset(cfg.dataset.path + "/train", cfg.dataset.n_perspectives,
                   "nerf", image_size=tuple(nm.original_image_size),
                   n_samples=cfg.dataset.get("n_synthetic_samples", 8),
                   azimuth_span_deg=span)
    ensure_dataset(cfg.dataset.path + "/valid", cfg.dataset.n_perspectives,
                   "nerf", image_size=tuple(nm.original_image_size),
                   n_samples=max(cfg.get("valid_sample_idx", 3) + 1, 4), rng=1,
                   azimuth_span_deg=span)
    train_dataset = load_dataset_nerf(cfg.dataset.n_perspectives,
                                      cfg.dataset.path + "/train")
    # per-scene fields (nerf_model.field=hashgrid) validate on a HELD-OUT
    # VIEW of the training scene (the generator never draws it below); the
    # pixel-conditioned default validates on unseen scenes
    valid_from_train = cfg.get("valid_from_train", False)
    valid_dataset = train_dataset if valid_from_train else load_dataset_nerf(
        cfg.dataset.n_perspectives, cfg.dataset.path + "/valid")

    src_idx = cfg.valid_perspective_src_indices[:nm.n_views]
    valid_data = {
        "src_colors": [valid_dataset.datasets["color"].read_sample_at_idx(
            cfg.valid_sample_idx, i) for i in src_idx],
        "src_camera_configs": [
            valid_dataset.datasets["camera_config"].read_sample_at_idx(
                cfg.valid_sample_idx, i) for i in src_idx],
        "tgt_camera_config": valid_dataset.datasets["camera_config"]
        .read_sample_at_idx(cfg.valid_sample_idx, cfg.valid_perspective_tgt_idx),
        "tgt_colors": valid_dataset.datasets["color"].read_sample_at_idx(
            cfg.valid_sample_idx, cfg.valid_perspective_tgt_idx),
    }

    data_generator = MVNeRFDataGenerator(
        train_dataset, n_rays_train=nm.n_rays_train,
        batch_size=cfg.nerf_training.batch_size, n_views=nm.n_views,
        exclude_perspectives=((cfg.valid_perspective_tgt_idx,)
                              if valid_from_train else ()),
        shuffle=True, rng=cfg.get("seed", 0))

    model = build_model(cfg, fusion)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    rng, init_key = jax.random.split(rng)
    sample_inputs, _ = data_generator[0]
    tx = T.make_nerf_optimizer(
        nerf_lr=cfg.nerf_training.get("learning_rate", 1e-4),
        feature_lr=cfg.nerf_training.get("feature_learning_rate", 1e-5),
        warmup_steps=cfg.nerf_training.get("warmup_steps", 10000),
        scale_down_after=cfg.nerf_training.get("scale_down_after", 450000))
    state = T.create_train_state(model, init_key, sample_inputs, tx=tx)

    model_checkpoint_name = os.path.join(cfg.nerf_training.model_path,
                                         "model_final")
    components = (ckpt.RENDERER_WITHOUT_COMPONENTS
                  if model.fusion == "without" else ckpt.RENDERER_COMPONENTS)
    restored = ckpt.load(model_checkpoint_name, state.params, components)
    if restored is not None:
        state = state.replace(params=restored)
        logger.info(f"Model loaded from {model_checkpoint_name}.")
    elif os.path.exists(cfg.get("torch_weights_path", "")):
        from ..clip.import_torch import load_pretrained_vit
        state = state.replace(
            params=load_pretrained_vit(cfg.torch_weights_path, state.params))
        logger.info("New model initialized from pretrained ViT weights")
    else:
        logger.info("New model initialized (random ViT; no torch weights found)")

    return train_model(model, state, data_generator, cfg, valid_data, rng)


@main_config("../configs", "nerf_1_view")
def main(cfg):
    return _main(cfg)


if __name__ == "__main__":
    main()
