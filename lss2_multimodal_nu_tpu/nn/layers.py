"""Shared NN primitives (NHWC, Flax linen).

Conventions used across the whole framework:
  * activations NHWC in `dtype` (fp32 or bf16), parameters always fp32;
  * BatchNorm statistics in fp32 (`use_running_average=not train`), torch
    momentum m maps to flax momentum 1-m;
  * module/param names chosen to give stable paths for the PyTorch weight
    porter (port/torch_port.py).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class _Conv1x1Split(nn.Module):
    """1x1 conv over a CONCAT of inputs, computed as a sum of per-branch
    matmuls without materializing the concat (algebraically identical;
    partials accumulate in f32). Param tree matches nn.Conv exactly
    (kernel (1, 1, sum(C_i), features) [+ bias]), so checkpoints and the
    torch porter are unaffected. Motivation: XLA materializes the wide
    concat through HBM; at VoVNet's late-stage shapes (4x11 spatial,
    1888 ch) the layout-padded concat costs 3x the matmul itself
    (scripts/bench_osa.py, v5e A/B: stage4 0.26 -> 0.08 ms)."""

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, fold_scale=None, fold_shift=None):
        ctot = sum(t.shape[-1] for t in xs)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, ctot, self.features), jnp.float32,
        )
        k2 = kernel[0, 0]
        if fold_scale is not None:  # inference BN folded into the weights
            k2 = k2 * fold_scale
        k2 = k2.astype(self.dtype)
        dn = (((3,), (0,)), ((), ()))
        off = 0
        acc = None
        for t in xs:
            c = t.shape[-1]
            y = jax.lax.dot_general(
                t.astype(self.dtype), k2[off : off + c], dn,
                preferred_element_type=jnp.float32,
            )
            off += c
            acc = y if acc is None else acc + y
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,),
                jnp.float32,
            )
            if fold_scale is not None:
                # BN(conv(x)+b) = conv_scaled(x) + g*b + shift: the conv bias
                # must ride through the BN scale like the kernel does
                bias = bias * fold_scale
            acc = acc + bias
        if fold_shift is not None:
            acc = acc + fold_shift
        return acc.astype(self.dtype)


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm + optional activation — the ubiquitous block.

    Matches torch nn.Conv2d(bias=False) + nn.BatchNorm2d(eps, momentum).
    A LIST input is accepted for 1x1/s1 convs and means "conv over the
    concat of these", computed concat-free (see _Conv1x1Split).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    # "torch": symmetric dilation*(k-1)//2 per side — bit-identical to
    # nn.Conv2d(padding=k//2). NOTE: XLA "SAME" pads asymmetrically at
    # stride 2 (e.g. (0,1) vs torch (1,1)) which shifts features by one
    # pixel; only TF-ported models (EfficientNet) want "SAME".
    padding: Any = "torch"
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    act: Optional[Callable] = nn.relu
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9  # flax convention: ra = m*ra + (1-m)*batch
    use_bn: bool = True
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        is_list = isinstance(x, (list, tuple))
        padding = self.padding
        if padding == "torch":
            ph = self.dilation[0] * (self.kernel[0] - 1) // 2
            pw = self.dilation[1] * (self.kernel[1] - 1) // 2
            padding = [(ph, ph), (pw, pw)]

        # Inference: fold BN's affine into the conv weights instead of running
        # it as a post-pass. The affine is NOT free under XLA at backbone
        # shapes (measured +0.027 ms/conv at stage1, scripts/bench_backbone.py
        # "no BN" A/B); folding matches the BN-less conv time while keeping
        # param trees / checkpoints / the torch porter unchanged (the conv and
        # bn modules are registered via stub calls, prototype-checked: init
        # trees identical in both modes). Training keeps the real BatchNorm
        # (batch stats + running-average updates).
        fold = self.use_bn and not train
        if fold:
            # Register the bn params/stats with a stub call ONLY during init
            # (same tree as the unfused path); in apply, read them straight
            # from the variable dict — no wasted compute in eager mode.
            if self.is_initializing():
                _ = nn.BatchNorm(
                    use_running_average=True,
                    momentum=self.bn_momentum,
                    epsilon=self.bn_eps,
                    dtype=self.dtype,
                    name="bn",
                )(jnp.zeros((1, 1, 1, self.features), self.dtype))
            bnp = self.get_variable("params", "bn")
            bns = self.get_variable("batch_stats", "bn")
            g = bnp["scale"] * jax.lax.rsqrt(bns["var"] + self.bn_eps)
            shift = bnp["bias"] - bns["mean"] * g

        if is_list:
            assert (
                self.kernel == (1, 1)
                and self.strides == (1, 1)
                and self.groups == 1
            ), "list input (concat-free form) is only defined for 1x1/s1"
            split = _Conv1x1Split(
                self.features, use_bias=self.use_bias, dtype=self.dtype,
                name="conv",
            )
            if fold:
                x = split(list(x), g, shift.astype(self.dtype))
            else:
                x = split(list(x))
        elif fold:
            if self.is_initializing():
                cin = x.shape[-1]
                _ = nn.Conv(
                    self.features,
                    self.kernel,
                    strides=self.strides,
                    padding=padding,
                    kernel_dilation=self.dilation,
                    feature_group_count=self.groups,
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    name="conv",
                )(jnp.zeros((1, *self.kernel, cin), self.dtype))
            cv = self.get_variable("params", "conv")
            wf = (cv["kernel"] * g).astype(self.dtype)
            if self.use_bias:  # BN after conv+bias: shift absorbs the bias
                shift = shift + cv["bias"] * g
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                wf,
                window_strides=self.strides,
                padding=padding,
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
            x = y + shift.astype(self.dtype)
        else:
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=padding,
                kernel_dilation=self.dilation,
                feature_group_count=self.groups,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.use_bn and not fold:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def torch_padding(kernel: Tuple[int, int], padding: Tuple[int, int]):
    """Explicit symmetric padding like torch Conv2d(padding=p)."""
    return [(padding[0], padding[0]), (padding[1], padding[1])]


def max_pool_ceil(
    x: jnp.ndarray,
    window: Tuple[int, int],
    strides: Tuple[int, int],
    padding: Tuple[int, int] = (0, 0),
    ceil_mode: bool = False,
) -> jnp.ndarray:
    """torch nn.MaxPool2d semantics incl. ceil_mode (used by VoVNet's 3x3/s2
    ceil pool and BevPost's (5,4) pool)."""
    _, h, w, _ = x.shape
    pads = []
    for size, k, s, p in ((h, window[0], strides[0], padding[0]), (w, window[1], strides[1], padding[1])):
        if ceil_mode:
            out = -(-(size + 2 * p - k) // s) + 1
            # torch: last window must start inside the (left-)padded input
            if (out - 1) * s >= size + p:
                out -= 1
        else:
            out = (size + 2 * p - k) // s + 1
        total_needed = (out - 1) * s + k
        pads.append((p, max(total_needed - size - p, 0)))
    # NB: the init value must be a plain Python scalar — a jnp array here
    # defeats JAX's specialized reduce_window_max primitive and its VJP,
    # breaking reverse AD under jit.
    return jax.lax.reduce_window(
        x,
        -float("inf"),
        jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *strides, 1),
        padding=[(0, 0), pads[0], pads[1], (0, 0)],
    )


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """torch nn.AdaptiveAvgPool2d(1) on NHWC."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def hard_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.Hardsigmoid: relu6(x + 3) / 6."""
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def drop_connect(
    x: jnp.ndarray, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Per-sample stochastic depth (efficientnet_pytorch utils.drop_connect)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape=shape).astype(x.dtype)
    return x / keep * mask


class Up(nn.Module):
    """Bilinear x`scale` upsample (align_corners=True) + concat skip + 2x
    conv-BN-ReLU (reference src/modules.py:9-27)."""

    features: int
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        from ..ops.sampling import resize_bilinear

        # resize to the skip's actual dims: identical to x`scale` upsampling
        # when shapes divide evenly (the reference case), and robust to
        # non-/32-divisible inputs where ceil-strided convs desync by a pixel
        x1 = resize_bilinear(x1, (x2.shape[1], x2.shape[2]), align_corners=True)
        x = jnp.concatenate([x2, x1], axis=-1)
        x = ConvBN(self.features, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBN(self.features, dtype=self.dtype, name="conv2")(x, train)
        return x
