"""Stack-A neural building blocks (reference src/modules.py), Flax/NHWC."""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.sampling import resize_bilinear
from .efficientnet import EfficientNetTrunk, encoder_channels
from .layers import ConvBN, Dtype, Up, global_avg_pool, max_pool_ceil


class Encoder(nn.Module):
    """EfficientNet trunk + Up(reduction_5, reduction_4) -> 512ch @ stride 16
    (reference src/modules.py:30-66)."""

    variant: str = "b4"
    out_features: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        eps = EfficientNetTrunk(variant=self.variant, dtype=self.dtype, name="trunk")(
            x, train
        )
        return Up(self.out_features, scale=2, dtype=self.dtype, name="up1")(
            eps["reduction_5"], eps["reduction_4"], train
        )


class CamEncode(nn.Module):
    """LSS v1 depth-net: 1x1 conv 512 -> D+C; softmax over the D slice gives
    the depth distribution (reference src/modules.py:69-91). Returns
    (depth (B,D,H,W-like as NHWC: B,H,W,D), feat (B,H,W,C)) so the lift can be
    fused downstream instead of materializing (D*C) here.
    """

    depth_bins: int
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.depth_bins + self.features, (1, 1), dtype=self.dtype, name="depthnet"
        )(x)
        depth = nn.softmax(x[..., : self.depth_bins], axis=-1)
        feat = x[..., self.depth_bins :]
        return depth, feat


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock; zero_init_residual zeroes bn2 gamma
    (reference src/modules.py:98 uses resnet18(zero_init_residual=True))."""

    features: int
    stride: int = 1
    zero_init_residual: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBN(
            self.features, (3, 3), strides=(self.stride, self.stride),
            dtype=self.dtype, name="conv1",
        )(x, train)
        y = nn.Conv(
            self.features, (3, 3), use_bias=False, dtype=self.dtype, name="conv2"
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=nn.initializers.zeros if self.zero_init_residual else nn.initializers.ones,
            dtype=self.dtype,
            name="bn2",
        )(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBN(
                self.features, (1, 1), strides=(self.stride, self.stride),
                act=None, dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(y + identity)


class BevEncode(nn.Module):
    """BEV decoder: restyled ResNet18 body + skip Up + final upsample head
    (reference src/modules.py:94-130)."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(
            64, (7, 7), strides=(2, 2), dtype=self.dtype, name="conv1"
        )(x, train)
        x1 = BasicBlock(64, dtype=self.dtype, name="layer1_0")(x, train)
        x1 = BasicBlock(64, dtype=self.dtype, name="layer1_1")(x1, train)
        x = BasicBlock(128, stride=2, dtype=self.dtype, name="layer2_0")(x1, train)
        x = BasicBlock(128, dtype=self.dtype, name="layer2_1")(x, train)
        x = BasicBlock(256, stride=2, dtype=self.dtype, name="layer3_0")(x, train)
        x = BasicBlock(256, dtype=self.dtype, name="layer3_1")(x, train)

        x = Up(256, scale=4, dtype=self.dtype, name="up1")(x, x1, train)
        # up2: x2 bilinear (align_corners=True) + conv->128 + BN/ReLU + 1x1 out
        _, h, w, _ = x.shape
        x = resize_bilinear(x, (h * 2, w * 2), align_corners=True)
        x = ConvBN(128, (3, 3), dtype=self.dtype, name="up2_conv")(x, train)
        return nn.Conv(
            self.out_features, (1, 1), dtype=self.dtype, name="up2_out"
        )(x)


class BevPost(nn.Module):
    """Crop encoder mapping the (80,88) BEV crop to camera-feature dims (8,22)
    (reference src/modules.py:133-144): conv s(2,1) + BN/ReLU + MaxPool(5,4)."""

    out_features: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(
            self.out_features, (3, 3), strides=(2, 1), dtype=self.dtype, name="conv"
        )(x, train)
        return max_pool_ceil(x, (5, 4), (5, 4))


class ASPPConv(nn.Module):
    features: int
    dilation: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(
            self.features, (3, 3), dilation=(self.dilation, self.dilation),
            dtype=self.dtype, name="conv",
        )(x, train)


class ASPP(nn.Module):
    """DeepLab ASPP (reference src/modules.py:172-201): 1x1 + three dilated
    3x3 + image pooling, project with dropout 0.5."""

    atrous_rates: Sequence[int]
    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = [ConvBN(self.features, (1, 1), dtype=self.dtype, name="conv1x1")(x, train)]
        for i, rate in enumerate(self.atrous_rates):
            res.append(
                ASPPConv(self.features, rate, dtype=self.dtype, name=f"aspp{i}")(x, train)
            )
        # image pooling branch: global pool -> 1x1 conv BN ReLU -> broadcast
        p = global_avg_pool(x)
        p = ConvBN(self.features, (1, 1), dtype=self.dtype, name="pool_conv")(p, train)
        p = jnp.broadcast_to(p, (x.shape[0], x.shape[1], x.shape[2], self.features))
        res.append(p)
        y = jnp.concatenate(res, axis=-1)
        y = ConvBN(self.features, (1, 1), dtype=self.dtype, name="project")(y, train)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return y


class SceneUnder(nn.Module):
    """ASPP(in, [12,24,36]) (reference src/modules.py:204-207)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ASPP((12, 24, 36), dtype=self.dtype, name="aspp")(x, train)


class Embedder(nn.Module):
    """conv3x3+BN+ReLU -> flatten -> linear (reference src/modules.py:210-218;
    the fused form of EmbedderConv + EmbedderFlat)."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.out_features, (3, 3), dtype=self.dtype, name="conv")(x, train)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return nn.Dense(self.out_features, dtype=self.dtype, name="fc")(x)


class EmbedderConv(nn.Module):
    """conv3x3+BN+ReLU (Embedder_f1 / Embedder_lr1, src/modules.py:220-241)."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(self.out_features, (3, 3), dtype=self.dtype, name="conv")(x, train)


class EmbedderFlat(nn.Module):
    """Flatten + Linear(out*H*W -> out) (Embedder_f2 / Embedder_lr2,
    src/modules.py:228-248). The reference hardcodes 22*8; we derive from the
    actual spatial dims (Appendix B note)."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch Flatten on NCHW flattens as (C, H, W); transpose so ported
        # weights line up.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return nn.Dense(self.out_features, dtype=self.dtype, name="fc")(x)


class Predictor(nn.Module):
    """Bare linear head (src/modules.py:250-254)."""

    classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.classes, dtype=self.dtype, name="fc")(x)
