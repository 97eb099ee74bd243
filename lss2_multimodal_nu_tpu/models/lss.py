"""LSS model (stack A pretrain model): EfficientNet encoder -> depth lift ->
voxel splat -> BEV decoder (reference src/model_baseline.py:11-140).

TPU-native differences from the reference:
  * geometry / voxelization / splat are the shared functional core
    (core.geometry + ops.lift_splat) — no per-model copies;
  * all shapes static under jit (masking instead of filtering);
  * NHWC activations; inputs are (B, N, H, W, 3).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import Config
from ..core.frustum import create_frustum
from ..core.geometry import get_geometry, voxel_indices
from ..core.grid import gen_dx_bx
from ..ops.lift_splat import lift_splat
from ..nn.lss_modules import BevEncode, CamEncode, Encoder
from ..nn.layers import Dtype


class LSS(nn.Module):
    """BEV segmentation model. Returns (B, X, Y, outC) logits (NHWC)."""

    cfg: Config
    dtype: Dtype = jnp.float32

    def setup(self):
        grid = self.cfg.grid
        self.dx, self.bx, self.nx = gen_dx_bx(grid.xbound, grid.ybound, grid.zbound)
        self.frustum = create_frustum(
            self.cfg.aug.final_dim, grid.dbound, self.cfg.model.downsample
        )
        self.depth_bins = self.frustum.shape[0]
        self.cam_c = self.cfg.model.cam_channels
        self.encoder = Encoder(
            variant=self.cfg.model.effnet_variant, dtype=self.dtype, name="encoder"
        )
        self.camencode = CamEncode(
            depth_bins=self.depth_bins,
            features=self.cam_c,
            dtype=self.dtype,
            name="camencode",
        )
        self.bevencode = BevEncode(
            out_features=self.cfg.model.seg_classes, dtype=self.dtype, name="bevencode"
        )

    def lift(self, cam_feats, b: int, n: int, train: bool):
        """cam_feats (B*N,fh,fw,512) -> depth (B,N,D,fh,fw), feat (B,N,fh,fw,C)."""
        depth, feat = self.camencode(cam_feats, train)
        fh, fw = feat.shape[1], feat.shape[2]
        depth = depth.reshape(b, n, fh, fw, self.depth_bins)
        depth = jnp.moveaxis(depth, -1, 2)  # (B,N,D,fh,fw)
        feat = feat.reshape(b, n, fh, fw, self.cam_c)
        return depth, feat

    def splat(self, feat, depth, rots, trans, intrins, post_rots, post_trans):
        """Geometry + voxel splat: -> BEV features (B, X, Y, C)."""
        geom = get_geometry(
            jnp.asarray(self.frustum), rots, trans, intrins, post_rots, post_trans
        )
        idx, valid = voxel_indices(geom, self.dx, self.bx, self.nx)
        return lift_splat(feat, depth, idx, valid, self.nx)

    def encode_cameras(self, imgs, train: bool):
        """imgs (B,N,H,W,3) -> depth (B,N,D,fh,fw), feat (B,N,fh,fw,C)."""
        b, n, h, w, c = imgs.shape
        x = imgs.reshape(b * n, h, w, c)
        x = self.encoder(x, train)
        return self.lift(x, b, n, train)

    def build_bev(self, imgs, rots, trans, intrins, post_rots, post_trans, train: bool):
        depth, feat = self.encode_cameras(imgs, train)
        return self.splat(feat, depth, rots, trans, intrins, post_rots, post_trans)

    def __call__(self, imgs, rots, trans, intrins, post_rots, post_trans, train: bool = False):
        bev = self.build_bev(imgs, rots, trans, intrins, post_rots, post_trans, train)
        return self.bevencode(bev, train)
