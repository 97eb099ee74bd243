"""Stack-B pre-training model (reference pre_train_vovnet.py:29-178):
the BEV branch of VoVNetBEVTransformer only (backbone -> depth -> lift-splat
-> BEV encoder), producing bev_seg alone.

Submodule names match VoVNetBEVTransformer exactly so the component-wise
checkpoints (backbone / depth_net / cam_encode / bev_encoder) transfer to the
full model without remapping (reference pre_train_vovnet.py:465-477 ->
train_vovnet_transformer.py:430-449).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..core.frustum import create_frustum
from ..core.geometry import get_geometry, voxel_indices
from ..core.grid import gen_dx_bx
from ..nn.depth_net import CamEncodeV2, MultiScaleDepthNet, StandardDepthNet
from ..nn.fusion import BEVEncoderTransformer
from ..nn.layers import Dtype
from ..nn.vovnet import VoVNetV2
from ..ops.lift_splat import lift_splat

# components saved/consumed by the transfer scheme
PRETRAIN_COMPONENTS = ("backbone", "depth_net", "cam_encode", "bev_encoder")


class VoVNetPreTrain(nn.Module):
    """Returns bev_seg (B, X, Y, outC) only."""

    cfg: Config
    dtype: Dtype = jnp.float32

    def setup(self):
        grid = self.cfg.grid
        mc = self.cfg.model
        self.dx, self.bx, self.nx = gen_dx_bx(grid.xbound, grid.ybound, grid.zbound)
        self.frustum = create_frustum(self.cfg.aug.final_dim, grid.dbound, mc.downsample)
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

    def __call__(self, imgs, rots, trans, intrins, post_rots, post_trans, train: bool = False):
        b, n = imgs.shape[0], imgs.shape[1]
        x = imgs.reshape(b * n, *imgs.shape[2:])
        feats = self.backbone(x, train)
        c3, c4 = feats["c3"], feats["c4"]
        depth = self.depth_net(c3, c4, train)
        feat = self.cam_encode(c3)
        fh, fw = feat.shape[1], feat.shape[2]
        depth = jnp.moveaxis(depth.reshape(b, n, fh, fw, self.depth_bins), -1, 2)
        feat = feat.reshape(b, n, fh, fw, self.cam_c)
        geom = get_geometry(
            jnp.asarray(self.frustum), rots, trans, intrins, post_rots, post_trans
        )
        idx, valid = voxel_indices(geom, self.dx, self.bx, self.nx)
        bev_feats = lift_splat(feat, depth, idx, valid, self.nx)
        bev_seg, _ = self.bev_encoder(bev_feats, train)
        return bev_seg
