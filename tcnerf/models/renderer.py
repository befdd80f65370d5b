"""Multi-view pixel-conditioned NeRF renderer (stage-1 model).

Capability parity with reference src/lib/mvnerf/model_v0..v4.py and
model_without.py — one module covers all six variants via `fusion`:
  'without'        — no CLIP; visual features upsampled 2x (model_without.py:28-29)
  'v0'..'v4'       — CLIP RN50 pyramid fused by CombineCLIPVisualV{0..4}
                     (v3/v4 additionally gate on a text embedding; the pure-NeRF
                     trainers feed a ones placeholder, model_v3.py:82-84)

TPU-first design notes:
  * rendering is a pure function of (params, inputs, rng) — the whole
    coarse->resample->fine pipeline jits into ONE program, no per-chunk host
    loop (reference chunks 512 rays through tf.function re-entry);
  * the per-sample MLP sees a [(B*V), R, S, C] layout whose trailing dim is the
    MLP width, so every Dense is a single large MXU matmul;
  * full-image inference (`render_image`) lax.scans over ray chunks on device
    with features encoded once.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import projection, render, sampling
from ..nn.blocks import RenderReadout
from ..nn.fusion import (CombineCLIPVisualV0, CombineCLIPVisualV1,
                         CombineCLIPVisualV2, CombineCLIPVisualV3,
                         CombineCLIPVisualV4)
from ..nn.mlp import MVResNetMLPEmbedding
from ..nn.vit import VisualFeatures
from ..ops.interpolate import (bilinear_gather_corners, gather_projection_features,
                               make_corner_image)

FUSIONS = {
    "v0": CombineCLIPVisualV0,
    "v1": CombineCLIPVisualV1,
    "v2": CombineCLIPVisualV2,
    "v3": CombineCLIPVisualV3,
    "v4": CombineCLIPVisualV4,
}


class MVNeRFRenderer(nn.Module):
    n_views: int = 2
    n_samples: int = 64
    n_features: int = 256
    embed_direction_vector: bool = True
    near: float = 0.7
    far: float = 1.5
    original_image_size: Tuple[int, int] = (480, 640)
    fusion: str = "v0"
    n_blocks: int = 6
    hidden_size: int = 128
    # encoder scaling knobs (reference pins ViT-B/16 at 224^2; tests shrink it)
    vit_size: Tuple[int, int] = (224, 224)
    vit_patch: int = 16
    vit_dim: int = 768
    vit_heads: int = 12
    vit_hooks: Sequence[int] = (3, 6, 9, 12)
    # CLIP tower size knobs (RN50 defaults; tests shrink them)
    clip_layers: Sequence[int] = (3, 4, 6, 3)
    clip_width: int = 64
    clip_embed_dim: int = 1024
    clip_image_size: int = 224
    # Field flavor: "pixel" = the reference's pixel-conditioned field
    # (projected per-view image features + 6-block 128-wide MLP,
    # layers.py:334-379) — the parity default. "hashgrid" = the
    # beyond-reference fast per-scene field (nn/hashgrid_field.py): hash
    # encoding + small MLP; source images/features are ignored at render
    # time and the encoder towers never run.
    field: str = "pixel"
    hashgrid_levels: int = 16
    hashgrid_table_log2: int = 14
    hashgrid_hidden: int = 64
    hashgrid_layers: int = 3
    hashgrid_bounds: Tuple = ((-0.2, 1.2), (-0.8, 0.8), (-0.4, 1.0))
    # v3/v4 fusion-decoder flavor. The reference stage-1 renderer uses the
    # defaults (model_v4.py:31 `CombineCLIPVisualV4()` = relu, no dense text
    # projection) while LanguageNeRF builds it with use_dense=True +
    # activation='elu' (lmvnerf/model_v4.py:58) — the two param trees DIFFER,
    # so a stage-1 checkpoint meant to serve as a language backbone
    # (LanguageNeRF.load_backbone restores _combine_clip_visual,
    # lmvnerf/model_v4.py:131-152) must be trained with the language flavor.
    # Set these from the config when pretraining a language backbone.
    fusion_use_dense: bool = False
    fusion_activation: str = "relu"
    # pre-projected corner-row gather: fold layer_0's feature-kernel slice
    # into the feature image and fetch each sample's four bilinear corners as
    # ONE gathered row (XLA's TPU row gather is row-count-limited; ~2.8x on
    # the dominant render stage, docs/perf_notes.md). False = the
    # reference-shaped 4-tap scattered gather (same math, reference
    # nerf_utils.py:277-285).
    corner_gather: bool = True
    # fused Pallas MLP chains (ops/pallas/resmlp.py). Differentiable — the
    # backward remats through the jnp reference (resmlp_rows_diff), so
    # training may enable it too; default False because the flax chain is
    # backend-portable and the kernel's win is serving-shaped (see
    # nn/mlp.py use_pallas and tests/test_kernels.py grad-parity tests).
    pallas_mlp: bool = False
    # rematerialize (jax.checkpoint) the per-sample MLP chains and the
    # ViT+DPT encoder in the backward pass. REQUIRED for full-scale training:
    # without it one fwd+bwd step at the reference shape (batch 8 x 512 rays
    # x 192 samples, 480x640 sources) stores ~5 GB of chain activations plus
    # the encoder pyramid and exhausts v5e HBM. Costs one extra forward of
    # the rematted segments; param tree is unchanged (lifted transform).
    remat: bool = False
    # compute dtype for the ViT+DPT+conv encoder ONLY ("bfloat16" or None =
    # follow `dtype`). The train step is encoder-bound (83% of its FLOPs,
    # docs/perf_notes.md round 4); bf16 encoder compute with f32 params is
    # the standard mixed-precision recipe for it. Off by default: the
    # reference trains f32 (parity default) — enable per-config after
    # checking the convergence recipe tolerates it.
    encoder_dtype: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.field == "hashgrid":
            from ..nn.hashgrid_field import HashGridField
            fld = dict(n_levels=self.hashgrid_levels,
                       table_size_log2=self.hashgrid_table_log2,
                       bounds=tuple(tuple(b) for b in self.hashgrid_bounds),
                       hidden_size=self.hashgrid_hidden,
                       n_layers=self.hashgrid_layers, dtype=self.dtype)
            self.coarse_embedding = HashGridField(**fld)
            self.coarse_readout = RenderReadout(4, dtype=self.dtype)
            self.fine_embedding = HashGridField(**fld)
            self.fine_readout = RenderReadout(4, dtype=self.dtype)
            return
        emb_cls = MVResNetMLPEmbedding
        vf_cls = VisualFeatures
        if self.remat:
            # static_argnums counts `self` as 0: features_projected (a python
            # bool branching the layer_0 application) is arg 4
            emb_cls = nn.remat(MVResNetMLPEmbedding, static_argnums=(4,))
            vf_cls = nn.remat(VisualFeatures)
        kw = dict(n_blocks=self.n_blocks, hidden_size=self.hidden_size,
                  n_views=self.n_views,
                  embed_direction_vector=self.embed_direction_vector,
                  n_input_features=(self.n_features + 3 if self.corner_gather
                                    else None),
                  use_pallas=self.pallas_mlp,
                  dtype=self.dtype)
        self.coarse_embedding = emb_cls(**kw)
        self.coarse_readout = RenderReadout(4, dtype=self.dtype)
        self.fine_embedding = emb_cls(**kw)
        self.fine_readout = RenderReadout(4, dtype=self.dtype)
        enc_dtype = (jnp.bfloat16 if self.encoder_dtype == "bfloat16"
                     else self.dtype)
        self.visual_features = vf_cls(
            n_features=self.n_features, original_image_size=self.original_image_size,
            vit_size=self.vit_size, patch_size=self.vit_patch, embed_dim=self.vit_dim,
            num_heads=self.vit_heads, hooks=self.vit_hooks, dtype=enc_dtype)
        if self.fusion != "without":
            from ..clip.model import CLIPVisualEncoder
            self.clip_visual = CLIPVisualEncoder(
                layers=tuple(self.clip_layers), width=self.clip_width,
                output_dim=self.clip_embed_dim,
                heads=max(self.clip_width // 2, 1), dtype=self.dtype)
            if self.fusion in ("v3", "v4"):
                self.combine_clip_visual = FUSIONS[self.fusion](
                    use_dense=self.fusion_use_dense,
                    activation=self.fusion_activation, dtype=self.dtype)
            else:
                self.combine_clip_visual = FUSIONS[self.fusion](dtype=self.dtype)

    # ------------------------------------------------------------- feature path

    def encode(self, src_images_flat):
        """[B*V, H, W, 3] -> visual feature map [B*V, H/2, W/2, n_features]."""
        out = self.visual_features(src_images_flat)
        if self.encoder_dtype is not None:
            # keep the render path in the model compute dtype — the encoder
            # dtype is an internal mixed-precision choice, not a contract
            out = out.astype(self.dtype or jnp.float32)
        return out

    def combine_features(self, src_images_flat, clip_outputs=None, clip_textuals=None):
        """Full fused feature image [B*V, H, W, n_features] (+ aux loss).

        For CLIP variants the caller supplies `clip_outputs` from the frozen
        CLIP tower (tcnerf.clip); for 'without' the visual features are
        upsampled 2x (reference model_without.py:75-79).
        """
        if self.field == "hashgrid":
            # the hash-grid field ignores image features entirely — return an
            # empty feature map so callers (train step's chunked path,
            # inference) keep a uniform signature without running the towers
            n = src_images_flat.shape[0]
            empty = jnp.zeros((n, 1, 1, 0), src_images_flat.dtype)
            return empty, jnp.array(0.0, src_images_flat.dtype)
        vis = self.encode(src_images_flat)
        if self.fusion == "without":
            n, h, w, c = vis.shape
            up = jax.image.resize(vis, (n, h * 2, w * 2, c), method="bilinear")
            return up, jnp.array(0.0, dtype=up.dtype)
        if clip_outputs is None:
            from ..clip.preprocess import preprocess
            clip_outputs = self.clip_visual(
                preprocess(src_images_flat, self.clip_image_size))
        if clip_textuals is None:
            clip_textuals = jnp.ones(
                (src_images_flat.shape[0], self.clip_embed_dim), vis.dtype)
        return self.combine_clip_visual(clip_outputs, vis, clip_textuals)

    # ---------------------------------------------------------------- rendering

    def render_rays(self, ray_origins, ray_directions, src_images, src_intrinsics,
                    src_extrinsics_inv, combined_features):
        """Hierarchical render of a ray batch.

        ray_origins/directions: [B, R, 3]; src_images: [B, V, H, W, 3];
        intrinsics/extrinsics_inv: [B, V, 4, 4];
        combined_features: [B, V, H, W, C].
        Returns (rgb, depth, fine_rgb, fine_depth).
        Reference: model_v0.py:102-184.
        """
        normalized = src_images * 2.0 - 1.0
        # keep the gather stream in the compute dtype: concatenating f32 RGB
        # with bf16 features would silently upcast the whole 262-wide gather
        normalized = normalized.astype(combined_features.dtype)
        key_c = self.make_rng("sampling")
        key_f = self.make_rng("sampling")

        corner_c = corner_f = None
        if self.corner_gather and self.field != "hashgrid":
            # fold each stage's layer_0 feature-kernel slice into the image
            # (once per render; loop-invariant under any chunk scan), then
            # stack the four bilinear corners into one row per pixel so the
            # per-sample gather reads a single [4*hidden] row.
            combined = jnp.concatenate([normalized, combined_features], axis=-1)
            b, v = combined.shape[:2]
            flat_img = combined.reshape((b * v,) + combined.shape[2:])
            corner_c = make_corner_image(
                self.coarse_embedding.project_image(flat_img))
            corner_f = make_corner_image(
                self.fine_embedding.project_image(flat_img))

        world_points, z = sampling.sample_along_ray(
            key_c, ray_origins, ray_directions, self.near, self.far, self.n_samples)
        if self.field == "hashgrid":
            # per-scene field: condition color on the WORLD-frame ray
            # direction (classic NeRF), not per-view camera directions
            cam_dirs = ray_directions[:, None]  # [B, 1, R, 3]
        else:
            cam_dirs = projection.world_to_camera_directions_mv(
                ray_directions, src_extrinsics_inv)  # [B, V, R, 3]

        chroma, density = self._field(
            world_points, z, cam_dirs, normalized, src_intrinsics,
            src_extrinsics_inv, combined_features, self.coarse_embedding,
            self.coarse_readout, corner_img=corner_c)
        rgb, depth, weights = render.volumetric_render(z, density, chroma)

        z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
        probs = weights[..., 1:-1]
        z_fine = sampling.sample_pdf(key_f, z_mid, probs, self.n_samples)
        # rank+one-hot-matmul sort/merge: TPU variadic sort measured ~20 ms
        # per 4096-ray chunk (tools/bench_stages.py); this is compare-sums on
        # the VPU + a [S, S] permutation matmul on the MXU
        from ..ops.sortmerge import merge_sorted, sort_small
        all_z = merge_sorted(z, sort_small(z_fine))
        fine_points = (ray_origins[:, :, None, :]
                       + all_z[..., None] * ray_directions[:, :, None, :])

        fine_chroma, fine_density = self._field(
            fine_points, all_z, cam_dirs, normalized, src_intrinsics,
            src_extrinsics_inv, combined_features, self.fine_embedding,
            self.fine_readout, corner_img=corner_f)
        fine_rgb, fine_depth, _ = render.volumetric_render(
            all_z, fine_density, fine_chroma)
        return rgb, depth, fine_rgb, fine_depth

    def _field(self, world_points, z, cam_dirs, normalized_images, src_intrinsics,
               src_extrinsics_inv, combined_features, embedding, readout,
               corner_img=None):
        b, r, s, _ = world_points.shape
        if self.field == "hashgrid":
            dirs = jnp.broadcast_to(cam_dirs[:, 0, :, None, :], (b, r, s, 3))
            emb = embedding(world_points, dirs)
            return readout(emb)
        v = normalized_images.shape[1]
        pixel_xy, cam_points = projection.project_points_mv(
            world_points, src_intrinsics, src_extrinsics_inv)
        if corner_img is not None:
            coords = pixel_xy.reshape(b * v, r * s, 2)
            feats = bilinear_gather_corners(corner_img, coords)
            feats = feats.reshape(b, v, r, s, feats.shape[-1])
        else:
            feats = gather_projection_features(
                normalized_images, combined_features, pixel_xy)  # [B,V,R,S,C+3]
        dirs = jnp.broadcast_to(cam_dirs[:, :, :, None, :], (b, v, r, s, 3))

        flat = lambda x: x.reshape((b * v, r, s, x.shape[-1]))
        # features_projected positionally: it is a remat static arg (setup)
        emb = embedding(flat(cam_points[..., :3]), flat(dirs), flat(feats),
                        corner_img is not None)
        chroma, density = readout(emb)  # [B, R, S, 3], [B, R, S]
        return chroma, density

    def __call__(self, inputs, clip_outputs=None, clip_textuals=None):
        """Full train path: encode + fuse features, render (reference call :75-87).

        inputs = (ray_origins, ray_directions, src_images, src_intrinsics,
                  src_extrinsics_inv).
        """
        ray_o, ray_d, src_images, src_intr, src_ext_inv = inputs
        b, v = src_images.shape[0], src_images.shape[1]
        flat_images = src_images.reshape((b * v,) + src_images.shape[2:])
        combined, aux = self.combine_features(flat_images, clip_outputs, clip_textuals)
        combined = combined.reshape((b, v) + combined.shape[1:])
        out = self.render_rays(ray_o, ray_d, src_images, src_intr, src_ext_inv,
                               combined)
        return out + (aux,)
