"""LSS v2 depth prediction heads (reference src/model_vovnet_transformer.py:22-122)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.sampling import resize_bilinear
from .layers import ConvBN, Dtype


class _DepthHead(nn.Module):
    """conv3x3(+bias)->BN->ReLU->conv1x1 to depth bins."""

    depth_bins: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(256, (3, 3), use_bias=True, dtype=self.dtype, name="conv")(x, train)
        return nn.Conv(self.depth_bins, (1, 1), dtype=self.dtype, name="out")(x)


class MultiScaleDepthNet(nn.Module):
    """Two heads (c3 @ s16, c4 @ s32), bilinear-upsample d4 to d3's size
    (align_corners=False), 1x1 fuse + BN + ReLU, softmax. Returns depth as
    NHWC (B*N, fH, fW, D)."""

    depth_bins: int = 41
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, train: bool = False):
        d3 = _DepthHead(self.depth_bins, dtype=self.dtype, name="depth_c3")(c3, train)
        d4 = _DepthHead(self.depth_bins, dtype=self.dtype, name="depth_c4")(c4, train)
        d4 = resize_bilinear(d4, (d3.shape[1], d3.shape[2]), align_corners=False)
        d = jnp.concatenate([d3, d4], axis=-1)
        # NOTE the reference applies BN+ReLU *before* softmax (quirk preserved)
        d = ConvBN(self.depth_bins, (1, 1), use_bias=True, dtype=self.dtype, name="fusion")(
            d, train
        )
        return nn.softmax(d, axis=-1)


class StandardDepthNet(nn.Module):
    """LSS v1 single-scale head on c3 (reference :73-87)."""

    depth_bins: int = 41
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c3, c4=None, train: bool = False):
        d = _DepthHead(self.depth_bins, dtype=self.dtype, name="depth_head")(c3, train)
        return nn.softmax(d, axis=-1)


class CamEncodeV2(nn.Module):
    """1x1 feature projection (depth decoupled from features, unlike v1's
    joint conv) — reference :90-122. Returns projected features only; the
    lift outer product is fused into ops.lift_splat downstream."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features):
        return nn.Conv(
            self.out_features, (1, 1), dtype=self.dtype, name="feat_proj"
        )(features)
