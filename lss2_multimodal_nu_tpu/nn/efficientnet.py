"""EfficientNet B0–B7 camera trunk in Flax (NHWC), TPU-first.

Re-implements the behavior of `efficientnet_pytorch.EfficientNet` as consumed
by the reference Encoder (src/modules.py:30-66): the stem + MBConv blocks are
walked collecting `reduction_*` endpoints at every stride change, and the
encoder fuses reduction_5 (stride 32) with reduction_4 (stride 16) through an
Up block into 512 channels.

Faithful details: swish activation, SE ratio 0.25 of *input* channels,
BatchNorm eps 1e-3 / torch momentum 0.01 (flax 0.99), per-block stochastic
depth scaled `0.2 * idx / n_blocks`, round_filters/round_repeats scaling.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN, Dtype, drop_connect, global_avg_pool

# (width_coefficient, depth_coefficient)
SCALING = {
    "b0": (1.0, 1.0),
    "b1": (1.0, 1.1),
    "b2": (1.1, 1.2),
    "b3": (1.2, 1.4),
    "b4": (1.4, 1.8),
    "b5": (1.6, 2.2),
    "b6": (1.8, 2.6),
    "b7": (2.0, 3.1),
}

# b0 base stages: (expand_ratio, kernel, stride, channels, repeats)
BASE_STAGES = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]

BN_EPS = 1e-3
BN_MOMENTUM = 0.99  # torch momentum 0.01

# Canonical training resolution per variant (efficientnet_pytorch
# utils.efficientnet_params). The torch package computes its SAME padding
# STATICALLY from this construction-time size (Conv2dStaticSamePadding), NOT
# from the runtime input — at b4's stage-3 stride-2 conv the tracked size is
# odd (380 -> 190 -> 95), giving pad (2,2) where dynamic TF-SAME at the
# reference's (128,352) input would give (1,2). We mirror the static scheme
# so ported b4 weights reproduce the reference trunk exactly.
IMAGE_SIZE = {
    "b0": 224, "b1": 240, "b2": 260, "b3": 300,
    "b4": 380, "b5": 456, "b6": 528, "b7": 600,
}


def static_same_pad(size: int, kernel: int, stride: int) -> Tuple[Tuple[int, int], int]:
    """((lo, hi) pad, output size) for one spatial dim of a
    Conv2dStaticSamePadding layer constructed at `size`."""
    out = -(-size // stride)
    total = max((out - 1) * stride + kernel - size, 0)
    return (total // 2, total - total // 2), out


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def swish(x):
    return nn.swish(x)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    in_ch: int
    out_ch: int
    expand_ratio: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    # depthwise-conv padding: "SAME" (dynamic TF rule, for standalone use) or
    # explicit ((lo,hi),(lo,hi)) static pads from the trunk's tracked size
    pad: Any = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        mid = self.in_ch * self.expand_ratio
        if self.expand_ratio != 1:
            x = ConvBN(
                mid, (1, 1), padding="SAME", act=swish, bn_eps=BN_EPS, bn_momentum=BN_MOMENTUM,
                dtype=self.dtype, name="expand",
            )(x, train)
        # depthwise
        x = ConvBN(
            mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=self.pad, groups=mid, act=swish, bn_eps=BN_EPS, bn_momentum=BN_MOMENTUM,
            dtype=self.dtype, name="depthwise",
        )(x, train)
        # squeeze-excitation (ratio of *input* channels)
        se_ch = max(1, int(self.in_ch * self.se_ratio))
        s = global_avg_pool(x)
        s = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = swish(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(s)
        x = x * nn.sigmoid(s)
        # project
        x = ConvBN(
            self.out_ch, (1, 1), padding="SAME", act=None, bn_eps=BN_EPS, bn_momentum=BN_MOMENTUM,
            dtype=self.dtype, name="project",
        )(x, train)
        if self.stride == 1 and self.in_ch == self.out_ch:
            rng = self.make_rng("dropout") if train and self.drop_rate > 0 else None
            x = inp + drop_connect(x, self.drop_rate, not train, rng)
        return x


class EfficientNetTrunk(nn.Module):
    """Stem + MBConv blocks; returns dict of reduction_{1..5} endpoints.

    Endpoint collection mirrors the reference walk (src/modules.py:48-58):
    `reduction_k` is the feature map *before* the k-th spatial reduction,
    except reduction_5 which is the final block output.
    """

    variant: str = "b4"
    drop_connect_rate: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        width, depth = SCALING[self.variant]
        stem_ch = round_filters(32, width)
        # Track the construction-time spatial size (square image_size) so
        # every strided conv gets efficientnet_pytorch's STATIC same pad —
        # see the IMAGE_SIZE comment. Stride-1 convs pad symmetrically
        # ((k-1)/2 each side), identical to dynamic SAME.
        size = IMAGE_SIZE[self.variant]
        stem_pad, size = static_same_pad(size, 3, 2)
        x = ConvBN(
            stem_ch, (3, 3), strides=(2, 2), padding=(stem_pad, stem_pad),
            act=swish, bn_eps=BN_EPS, bn_momentum=BN_MOMENTUM,
            dtype=self.dtype, name="stem",
        )(x, train)

        # flatten per-stage configs into a block list like efficientnet_pytorch
        blocks: List[Tuple[int, int, int, int, int]] = []  # (in,out,expand,k,s)
        in_ch = stem_ch
        for expand, k, s, c, r in BASE_STAGES:
            out_ch = round_filters(c, width)
            reps = round_repeats(r, depth)
            for i in range(reps):
                blocks.append((in_ch, out_ch, expand, k, s if i == 0 else 1))
                in_ch = out_ch

        endpoints: Dict[str, jnp.ndarray] = {}
        prev = x
        n = len(blocks)
        for idx, (ic, oc, er, k, s) in enumerate(blocks):
            rate = self.drop_connect_rate * idx / n
            dpad, size = static_same_pad(size, k, s)
            x = MBConv(
                ic, oc, er, k, s, drop_rate=rate, pad=(dpad, dpad),
                dtype=self.dtype, name=f"block{idx}",
            )(x, train)
            if prev.shape[1] > x.shape[1]:
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            prev = x
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        return endpoints


def encoder_channels(variant: str) -> Tuple[int, int]:
    """(reduction_5, reduction_4) channel counts — the Up fuse input sizes
    (reference comment src/modules.py:35)."""
    width, _ = SCALING[variant]
    return round_filters(320, width), round_filters(112, width)
