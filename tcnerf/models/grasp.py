"""Energy-based grasp models over SE(3) poses.

Covers three reference model families with one module:
  * GraspMVNeRF (goal-conditioned EBM, src/lib/grasp_mvnerf/model.py:15-171)
    — frozen NeRF backbone (fine_embedding with complete_output +
    visual_features) + trainable GraspReadout; 42 probe points per pose.
  * DeltaNGF (gradient-supervised field, src/lib/delta_ngf/model.py:34-309)
    — same energy head, trained with an additional second-order gradient loss
    along expert trajectories (see tcnerf.models.grasp_training).
  * LanguageNeRF (src/lib/lmvnerf/model_v4.py:36-335) — adds frozen CLIP
    visual+text towers and a CombineCLIPVisual fusion; handled by computing
    the fused feature map with `tcnerf.models.features` and passing it here.

TPU-first notes: pose expansion (42 probes x N poses) is two batched einsum
matmuls; feature gathers ride the shared bilinear-gather op; the pose variables
live OUTSIDE the module as explicit function inputs, so energy gradients w.r.t.
poses are plain jax.grad — no stateful tf.Variable assignment tricks
(reference model.py:99-110,247-252).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import projection, se3
from ..core.prec import heinsum
from ..nn.grasp_readout import GraspReadout
from ..nn.mlp import MVResNetMLPEmbedding
from ..nn.vit import VisualFeatures
from ..ops.interpolate import (bilinear_gather, bilinear_gather_corners,
                               make_corner_image)
from ..tasks.transform import Affine


def probe_transforms(n_5d_poses: int = 7) -> np.ndarray:
    """The 6 gripper-frame bases x n z-offsets probe grid -> [P, 4, 4].

    Reference: src/lib/grasp_mvnerf/model.py:34-63 (offsets x=0.02, y=0.015,
    z=0.0125; side fingers rotated +-pi/2 about y; z-steps spanning
    +-(x_off - 0.005)).
    """
    base_x, base_y, base_z = 0.02, 0.015, 0.0125
    step = (base_x - 0.005) / ((n_5d_poses - 1) / 2)
    bases = [
        Affine(translation=[0, base_y, 0]),
        Affine(translation=[0, -base_y, 0]),
        Affine(translation=[-base_x, base_y, base_z], rotation=[0.0, np.pi / 2, 0.0]),
        Affine(translation=[base_x, base_y, base_z], rotation=[0.0, -np.pi / 2, 0.0]),
        Affine(translation=[-base_x, -base_y, base_z], rotation=[0.0, np.pi / 2, 0.0]),
        Affine(translation=[base_x, -base_y, base_z], rotation=[0.0, -np.pi / 2, 0.0]),
    ]
    half = int((n_5d_poses - 1) / 2)
    offsets = [Affine(translation=[0.0, 0.0, i * step])
               for i in range(-half, half + 1)]
    mats = [(b * t).matrix for b in bases for t in offsets]
    return np.asarray(mats, dtype=np.float32)


class GraspEBM(nn.Module):
    """Scalar grasp-success energy for candidate SE(3) poses.

    `__call__(poses, src_images, src_intrinsics, src_extrinsics_inv,
    batched_features)` with poses [B, N, 4, 4] homogeneous matrices returns
    energies [B, N]. `batched_features` is the (frozen-backbone or fused)
    feature image [B, V, H/2, W/2, C] from VisualFeatures / CLIP fusion.
    """

    n_views: int = 1
    n_features: int = 256
    original_image_size: Tuple[int, int] = (480, 640)
    n_5d_poses: int = 7
    readout_activation: str = "relu"          # grasp_mvnerf flavor
    readout_kernel_init: str = "glorot_uniform"
    readout_use_bias: bool = True
    n_blocks: int = 6
    hidden_size: int = 128
    # language conditioning: None = goal/dngf backbone features; 'v0'..'v4' =
    # CLIP fusion (LanguageNeRF, reference lmvnerf/model_v4.py:176-190)
    fusion: Optional[str] = None
    fusion_use_dense: bool = True
    fusion_activation: str = "elu"
    # CLIP tower size knobs (RN50 defaults; tests shrink them)
    clip_layers: Sequence[int] = (3, 4, 6, 3)
    clip_width: int = 64
    clip_embed_dim: int = 1024
    clip_text_width: int = 512
    clip_text_layers: int = 12
    clip_image_size: int = 224
    vit_size: Tuple[int, int] = (224, 224)
    vit_patch: int = 16
    vit_dim: int = 768
    vit_heads: int = 12
    vit_hooks: Sequence[int] = (3, 6, 9, 12)
    # pre-projected corner-row gather (see MVNeRFRenderer.corner_gather):
    # one gathered row per probe instead of four, with layer_0's feature
    # slice folded into the feature image. Exact same math; the projected
    # corner image is pose-independent so XLA hoists it out of the pose-
    # optimization scan. False = reference-shaped 4-tap scattered gather.
    corner_gather: bool = True
    # instant-NGP hash-grid positional field (BASELINE config 4): a trainable
    # multiresolution hash encoding of the probe WORLD positions feeds the
    # energy readout as an extra stream (reference field: the delta_ngf
    # grasp field src/lib/delta_ngf/model.py). The NeRF backbone params are
    # untouched, so frozen-backbone checkpoints keep loading; the tables and
    # the extra readout downscale train with the head.
    hash_encoding: bool = False
    hash_levels: int = 16
    hash_size_log2: int = 14
    hash_features: int = 2
    hash_base_res: int = 16
    hash_finest_res: int = 512
    workspace_bounds: Tuple[Tuple[float, float], ...] = (
        (0.35, 0.85), (-0.25, 0.25), (0.0, 0.2))
    # rematerialize the fusion decoder in the backward pass. Only matters
    # when the decoder trains (grasp_training.train_fusion): its U-Net
    # holds multi-GB activations at batch 8 x 480x640 full-res — remat
    # stores the tower outputs only and recomputes the decoder forward.
    remat_fusion: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.fine_embedding = MVResNetMLPEmbedding(
            n_blocks=self.n_blocks, hidden_size=self.hidden_size,
            n_views=self.n_views, embed_direction_vector=True,
            complete_output=True,
            n_input_features=(self.n_features + 3 if self.corner_gather
                              else None),
            dtype=self.dtype)
        self.visual_features = VisualFeatures(
            n_features=self.n_features, original_image_size=self.original_image_size,
            vit_size=self.vit_size, patch_size=self.vit_patch,
            embed_dim=self.vit_dim, num_heads=self.vit_heads, hooks=self.vit_hooks,
            dtype=self.dtype)
        self.grasp_readout = GraspReadout(
            use_bias=self.readout_use_bias, activation=self.readout_activation,
            kernel_initializer=self.readout_kernel_init, dtype=self.dtype)
        if self.fusion is not None:
            from ..clip.model import CLIPTextualEncoder, CLIPVisualEncoder
            from ..nn.fusion import (CombineCLIPVisualV3, CombineCLIPVisualV4)
            from ..nn import fusion as fusion_mod
            self.clip_visual = CLIPVisualEncoder(
                layers=tuple(self.clip_layers), width=self.clip_width,
                output_dim=self.clip_embed_dim,
                heads=max(self.clip_width // 2, 1), dtype=self.dtype)
            self.clip_textual = CLIPTextualEncoder(
                width=self.clip_text_width, n_layers=self.clip_text_layers,
                heads=max(self.clip_text_width // 64, 1),
                output_dim=self.clip_embed_dim, dtype=self.dtype)
            cls = {"v0": fusion_mod.CombineCLIPVisualV0,
                   "v1": fusion_mod.CombineCLIPVisualV1,
                   "v2": fusion_mod.CombineCLIPVisualV2,
                   "v3": CombineCLIPVisualV3, "v4": CombineCLIPVisualV4}[self.fusion]
            if self.remat_fusion:
                cls = nn.remat(cls)
            if self.fusion in ("v3", "v4"):
                self.combine_clip_visual = cls(
                    use_dense=self.fusion_use_dense,
                    activation=self.fusion_activation, dtype=self.dtype)
            else:
                self.combine_clip_visual = cls(dtype=self.dtype)
        if self.hash_encoding:
            from ..ops.hashgrid import HashGridConfig, init_hash_params
            self.hash_cfg = HashGridConfig(
                n_levels=self.hash_levels,
                table_size_log2=self.hash_size_log2,
                features_per_level=self.hash_features,
                base_resolution=self.hash_base_res,
                finest_resolution=self.hash_finest_res,
                bounds=tuple(tuple(b) for b in self.workspace_bounds))
            self.hash_tables = self.param(
                "hash_tables", lambda key: init_hash_params(key, self.hash_cfg))
        self.probes = jnp.asarray(probe_transforms(self.n_5d_poses))
        self.z_dir = jnp.asarray([0.0, 0.0, 1.0])

    @property
    def n_probes(self):
        return 6 * self.n_5d_poses

    def encode(self, src_images):
        """[B, V, H, W, 3] -> full-res feature image [B, V, H, W, C].

        NOTE the 2x upsample: the reference's grasp/delta train paths feed
        half-res VisualFeatures straight into a concat with full-res images
        (grasp_mvnerf/model.py:106,134) which is shape-inconsistent as
        written; they were trained when VisualFeatures still upsampled 2x
        (the commented-out feature_upsample, layers.py:247-248,258). We
        restore that upsample — the inference path (full-res fused features,
        utils/util.py:117-139) then matches the train path.
        """
        b, v = src_images.shape[0], src_images.shape[1]
        flat = src_images.reshape((b * v,) + src_images.shape[2:])
        feats = self.visual_features(flat)
        n, h, w, c = feats.shape
        feats = jax.image.resize(feats, (n, h * 2, w * 2, c), method="bilinear")
        return feats.reshape((b, v, h * 2, w * 2, c))

    def fusion_inputs(self, src_images, clip_tokens=None):
        """Frozen-tower forward only: CLIP visual pyramid, visual features,
        text embedding — everything the fusion decoder consumes. Split out so
        the train_fusion mode (grasp_training.delta_ngf_train_step) can run
        the frozen towers once OUTSIDE the differentiated function and apply
        the trainable decoder inside it."""
        from ..clip.preprocess import preprocess
        b, v = src_images.shape[0], src_images.shape[1]
        flat = src_images.reshape((b * v,) + src_images.shape[2:])
        clip_outputs = self.clip_visual(preprocess(flat, self.clip_image_size))
        vis = self.visual_features(flat)
        if clip_tokens is None:
            textuals = jnp.ones((b * v, self.clip_embed_dim), vis.dtype)
        else:
            textuals = self.clip_textual(clip_tokens)  # [B, 1024]
            textuals = jnp.repeat(textuals, v, axis=0)
        return clip_outputs, vis, textuals

    def apply_fusion(self, clip_outputs, vis, textuals):
        """Fusion decoder over precomputed tower outputs -> [B, V, H, W, C]."""
        combined, _ = self.combine_clip_visual(clip_outputs, vis, textuals)
        n = combined.shape[0]
        v = self.n_views
        return combined.reshape((n // v, v) + combined.shape[1:])

    def compute_features(self, src_images, clip_tokens=None):
        """Fused full-res features for language variants; backbone features
        otherwise. Reference: lmvnerf/model_v4.py:176-190, utils/util.py:117-139."""
        if self.fusion is None:
            return self.encode(src_images)
        return self.apply_fusion(*self.fusion_inputs(src_images, clip_tokens))

    def energy(self, poses, src_images, src_intrinsics, src_extrinsics_inv,
               batched_features):
        """Energy of candidate poses [B, N, 4, 4] -> [B, N].

        Reference _call: src/lib/grasp_mvnerf/model.py:113-158.
        """
        normalized = src_images * 2.0 - 1.0
        # expand each candidate into the probe grid: [B, N, P, 4, 4]
        probe_poses = heinsum("bnij,pjk->bnpik", poses, self.probes)
        translations = probe_poses[..., :3, 3]

        pixel_xy, cam_points = projection.project_probe_points(
            translations, src_intrinsics, src_extrinsics_inv)  # [B, V, N, P, .]

        b, v = normalized.shape[0], normalized.shape[1]
        n, p = poses.shape[1], self.n_probes
        combined = jnp.concatenate([normalized, batched_features], axis=-1)
        combined = combined.reshape((b * v,) + combined.shape[2:])
        if self.corner_gather:
            corner = make_corner_image(
                self.fine_embedding.project_image(combined))
            feats = bilinear_gather_corners(
                corner, pixel_xy.reshape(b * v, n * p, 2))
        else:
            feats = bilinear_gather(combined, pixel_xy.reshape(b * v, n * p, 2))

        dirs = projection.rotate_directions(
            probe_poses[..., :3, :3], self.z_dir, src_extrinsics_inv)  # [B,V,N,P,3]

        # layout [(B V), N, P, D] — poses axis before probes (reference :145-153)
        cam_points = cam_points.reshape(b * v, n, p, 3)
        dirs = dirs.reshape(b * v, n, p, 3)
        feats = feats.reshape(b * v, n, p, feats.shape[-1])

        activations = self.fine_embedding(
            cam_points, dirs, feats, features_projected=self.corner_gather)
        # fused-stream activations: mean-fusion output + fusion blocks
        # (reference takes [4:] of the 8-entry list for n_blocks=6,
        # grasp_mvnerf/model.py:155; generalized to any depth)
        n_skip = self.n_blocks // 2 + 1
        extra = None
        if self.hash_encoding:
            from ..ops.hashgrid import hash_encode
            # probe positions in WORLD frame (view-independent, like the
            # post-fusion activations which have leading axis B)
            extra = hash_encode(self.hash_tables, translations, self.hash_cfg)
            extra = extra.astype(activations[-1].dtype)
        return self.grasp_readout(activations[n_skip:], extra)

    def __call__(self, poses, src_images, src_intrinsics, src_extrinsics_inv,
                 batched_features=None):
        if batched_features is None:
            batched_features = self.encode(src_images)
        return self.energy(poses, src_images, src_intrinsics, src_extrinsics_inv,
                           batched_features)

    def init_all(self, poses, src_images, src_intrinsics, src_extrinsics_inv,
                 clip_tokens=None):
        """Initialization path touching every submodule (incl. the CLIP
        towers + fusion when `fusion` is set) — __call__ alone skips them."""
        features = self.compute_features(src_images, clip_tokens)
        return self.energy(poses, src_images, src_intrinsics,
                           src_extrinsics_inv, features)

    def energy_from_pose_params(self, translations, rotations, src_images,
                                src_intrinsics, src_extrinsics_inv,
                                batched_features,
                                rotation_representation="quaternion"):
        """Energy as a function of raw pose parameters — differentiable w.r.t.
        (translations, rotations) for both EBM ascent and DeltaNGF training."""
        poses = se3.pose_to_matrix(translations, rotations, rotation_representation)
        return self.energy(poses, src_images, src_intrinsics, src_extrinsics_inv,
                           batched_features)
