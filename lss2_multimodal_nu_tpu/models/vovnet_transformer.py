"""VoVNet + LSS v1/v2 + lightweight transformer + per-camera reasoning —
the flagship stack-B model (reference src/model_vovnet_transformer.py:354-639).

Two-branch architecture:
  BEV branch: VoVNet c3/c4 -> depth net (v1 single- or v2 multi-scale) ->
    CamEncodeV2 projection -> fused lift-splat (ops.lift_splat) ->
    BEVEncoderTransformer (deformable-attention refinement + seg head).
  TXT branch: AdaptiveFeaturePyramid(c3) -> SceneUnder -> global pool ->
    optional cross-camera attention (V2/V3) -> optional BEV-camera fusion
    (V3) -> UnifiedPredictor.

Ablation switchboard matches VERSION_FLAGS (train_vovnet_transformer.py:30-34):
  V1: no camera attn, no cross attn;  V2: camera attn;  V3: both.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import Config
from ..core.frustum import create_frustum
from ..core.geometry import get_geometry, voxel_indices
from ..core.grid import gen_dx_bx
from ..nn.depth_net import CamEncodeV2, MultiScaleDepthNet, StandardDepthNet
from ..nn.fusion import (
    AdaptiveFeaturePyramid,
    BEVCameraFusion,
    BEVEncoderTransformer,
    LightweightCameraTransformer,
    UnifiedPredictor,
)
from ..nn.layers import Dtype, global_avg_pool
from ..nn.lss_modules import SceneUnder
from ..nn.vovnet import VoVNetV2
from ..ops.lift_splat import lift_splat
from ..parallel.mesh import constrain_batch


class VoVNetBEVTransformer(nn.Module):
    """Returns (bev_seg (B,200,200,4), action (B,4), desc (B,8))."""

    cfg: Config
    dtype: Dtype = jnp.float32

    def setup(self):
        grid = self.cfg.grid
        mc = self.cfg.model
        self.dx, self.bx, self.nx = gen_dx_bx(grid.xbound, grid.ybound, grid.zbound)
        self.frustum = create_frustum(
            self.cfg.aug.final_dim, grid.dbound, mc.downsample
        )
        self.depth_bins = self.frustum.shape[0]
        self.cam_c = mc.v2_cam_channels

        self.backbone = VoVNetV2(model_name=mc.vovnet_type, dtype=self.dtype, name="backbone")
        if mc.lss_version == "v2":
            self.depth_net = MultiScaleDepthNet(
                depth_bins=self.depth_bins, dtype=self.dtype, name="depth_net"
            )
        else:
            self.depth_net = StandardDepthNet(
                depth_bins=self.depth_bins, dtype=self.dtype, name="depth_net"
            )
        self.cam_encode = CamEncodeV2(out_features=self.cam_c, dtype=self.dtype, name="cam_encode")
        self.bev_encoder = BEVEncoderTransformer(
            out_features=mc.seg_classes, dtype=self.dtype, name="bev_encoder"
        )
        self.feature_pyramid = AdaptiveFeaturePyramid(256, dtype=self.dtype, name="feature_pyramid")
        self.sceneunder = SceneUnder(dtype=self.dtype, name="sceneunder")
        self.n_cameras = self.cfg.aug.ncams
        if mc.use_camera_attn:
            self.camera_transformer = LightweightCameraTransformer(
                n_cameras=self.n_cameras, dtype=self.dtype, name="camera_transformer"
            )
        else:
            self.camera_transformer = None
        if mc.use_cross_attn:
            self.bev_fusion = BEVCameraFusion(dtype=self.dtype, name="bev_fusion")
        else:
            self.bev_fusion = None
        self.unified_predictor = UnifiedPredictor(
            num_action_classes=mc.num_action_classes,
            num_desc_classes=mc.num_desc_classes,
            n_cameras=self.n_cameras,
            dtype=self.dtype,
            name="unified_predictor",
        )

    def encode_cameras(self, imgs, train: bool = False):
        """Backbone over the flattened (B*N) camera stack -> (c3, c4)."""
        b, n = imgs.shape[0], imgs.shape[1]
        x = imgs.reshape(b * n, *imgs.shape[2:])
        feats = self.backbone(x, train)
        return feats["c3"], feats["c4"]

    def lift_to_bev(self, c3, c4, rots, trans, intrins, post_rots, post_trans,
                    train: bool = False):
        """Depth/feature heads + frustum geometry + fused lift-splat ->
        (B, nx, nx, C) BEV features. Exposed as a method so profilers and
        the bench time exactly the deployed stage (no re-inlined math)."""
        b, n = rots.shape[0], rots.shape[1]
        depth = self.depth_net(c3, c4, train)  # (B*N, fh, fw, D)
        feat = self.cam_encode(c3)  # (B*N, fh, fw, C)
        fh, fw = feat.shape[1], feat.shape[2]
        depth = jnp.moveaxis(depth.reshape(b, n, fh, fw, self.depth_bins), -1, 2)
        feat = feat.reshape(b, n, fh, fw, self.cam_c)
        geom = get_geometry(
            jnp.asarray(self.frustum), rots, trans, intrins, post_rots, post_trans
        )
        idx, valid = voxel_indices(geom, self.dx, self.bx, self.nx)
        return lift_splat(feat, depth, idx, valid, self.nx)

    def txt_branch(self, c3, bev_refined, train: bool = False):
        """Feature pyramid -> scene understanding -> (cross-)attention ->
        unified action/description predictor."""
        pyr = self.feature_pyramid(c3, train)
        scene = self.sceneunder(pyr, train)
        scene_global = global_avg_pool(scene, keepdims=False)  # (B*N, 256)
        n = self.n_cameras
        # (B*N, C) -> (B, N, C): XLA's sharding propagation gives up at this
        # reshape under a mesh (full-replication fallback, VERDICT r3 item 2)
        # — re-assert the batch sharding explicitly.
        scene_global = constrain_batch(
            scene_global.reshape(-1, n, scene_global.shape[-1])
        )
        b = scene_global.shape[0]
        cam_ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
        attended = scene_global
        if self.camera_transformer is not None:
            attended = self.camera_transformer(attended, cam_ids, train)
        fused = attended
        if self.bev_fusion is not None:
            fused = self.bev_fusion(fused, bev_refined, train)
        return self.unified_predictor(fused, train)

    def __call__(self, imgs, rots, trans, intrins, post_rots, post_trans, train: bool = False):
        c3, c4 = self.encode_cameras(imgs, train)
        # ---- BEV branch ----
        bev_feats = self.lift_to_bev(
            c3, c4, rots, trans, intrins, post_rots, post_trans, train
        )
        bev_seg, bev_refined = self.bev_encoder(bev_feats, train)
        # ---- TXT branch ----
        action, desc = self.txt_branch(c3, bev_refined, train)
        return bev_seg, action, desc
