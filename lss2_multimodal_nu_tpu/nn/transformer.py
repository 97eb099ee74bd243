"""Lightweight BEV transformer with deformable attention
(reference src/transformer_modules.py), redesigned TPU-first:

  * the reference samples each attention head through a Python loop over
    `F.grid_sample` calls (transformer_modules.py:140-155); here all heads and
    points are gathered in ONE vectorized bilinear-gather (ops.sampling) —
    B*heads batched, fully fused by XLA;
  * faithful init: offsets start at a spiral grid, attention weights at
    uniform (zero logits), value/output projections xavier-uniform.
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import ffn_pallas
from ..ops.deformable_sampling import deformable_sample_combine_xy
from ..parallel.mesh import constrain_batch
from .layers import Dtype


def sine_position_embedding(
    h: int, w: int, num_pos_feats: int = 128, temperature: float = 10000.0
) -> np.ndarray:
    """2D sine PE over the BEV grid (reference transformer_modules.py:12-59).

    Static (compile-time) numpy. Returns (H, W, 2*num_pos_feats) with
    channel order [pos_y, pos_x] to match the reference's cat+permute.
    """
    scale = 2 * math.pi
    y = np.arange(h, dtype=np.float32) / max(h - 1, 1) * scale
    x = np.arange(w, dtype=np.float32) / max(w - 1, 1) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[:, None] / dim_t  # (W, F)
    pos_y = y[:, None] / dim_t  # (H, F)
    pos_x = np.stack([np.sin(pos_x[:, 0::2]), np.cos(pos_x[:, 1::2])], axis=2).reshape(w, -1)
    pos_y = np.stack([np.sin(pos_y[:, 0::2]), np.cos(pos_y[:, 1::2])], axis=2).reshape(h, -1)
    pos_y = np.broadcast_to(pos_y[:, None, :], (h, w, num_pos_feats))
    pos_x = np.broadcast_to(pos_x[None, :, :], (h, w, num_pos_feats))
    return np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)


def _spiral_offset_bias(n_heads: int, n_points: int) -> np.ndarray:
    """Reference DeformableAttention._reset_parameters (:85-98): heads spread
    on a circle, point k pushed out by (k+1)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (H, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, :], (1, n_points, 1))
    for i in range(n_points):
        grid[:, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


class FoldingDense(nn.Module):
    """Param-compatible stand-in for ``nn.Dense(features)`` that consumes the
    PRE-FOLD sampling output (B, N, n_heads*4*dh) and absorbs the bilinear
    quadrant fold into the projection by replicating each weight row 4x:

        out = fold(pre) @ W + b  ==  pre @ expand(W) + b

    (the 4 quadrant groups of a head share the head's dh weight rows). This
    keeps every materialized tensor at >=128 lanes — folding first would
    produce a dh=32-lane tensor that the TPU layout pads 4x in HBM."""

    features: int
    n_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pre):
        """pre: (B, n_heads, N, 4*dh) -> (B, N, features).

        Contracting over (head, 4*dh) in one dot_general lets the MXU read
        `pre` head-by-head directly — an explicit (B, N, heads*4dh) transpose
        would copy ~1 GB at flagship shapes."""
        c = self.features
        dh = c // self.n_heads
        kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(), (c, c), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        w_exp = jnp.broadcast_to(
            kernel.reshape(self.n_heads, 1, dh, c), (self.n_heads, 4, dh, c)
        ).reshape(self.n_heads, 4 * dh, c)
        out = jax.lax.dot_general(
            pre,
            w_exp.astype(self.dtype),
            dimension_numbers=(((1, 3), (0, 1)), ((), ())),
        )  # (B, N, c)
        return out + bias.astype(self.dtype)


class DeformableAttention(nn.Module):
    """Sparse attention: 8 sampled points per query instead of 40k-token full
    attention (reference transformer_modules.py:62-167)."""

    d_model: int = 256
    n_heads: int = 8
    n_points: int = 8
    # 'auto' | 'pallas' | 'xla' — see ops.deformable_sampling
    sampling_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, reference_points):
        """query/value: (B, N, C); reference_points: (N, 2) or (B, N, 2) in [0,1]."""
        b, n, c = query.shape
        h = w = int(math.sqrt(n))
        nh, npts = self.n_heads, self.n_points
        dh = c // nh

        # All plumbing is channel-major / trailing-N: any tensor whose
        # trailing dims are tiny (2, npts=8, dh=32) gets lane-padded to 128
        # by the TPU tiled layout when it materializes at a transpose —
        # measured at ~90 ms/forward before this restructuring.
        offsets = nn.Dense(
            nh * npts * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _spiral_offset_bias(nh, npts), dtype
            ),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query)  # (B, N, nh*npts*2), channels ordered (head, point, xy)
        offsets = jnp.transpose(offsets, (0, 2, 1)).reshape(b, nh, npts, 2, n)

        attn = nn.Dense(
            nh * npts,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query)  # (B, N, nh*npts)
        attn = jnp.transpose(attn, (0, 2, 1)).reshape(b, nh, npts, n)
        attn = nn.softmax(attn, axis=2)  # over the points axis

        if reference_points.ndim == 2:
            reference_points = reference_points[None]
        refx = reference_points[..., 0][:, None, None, :]  # (1|B, 1, 1, N)
        refy = reference_points[..., 1][:, None, None, :]
        # reference divides both components by h (transformer_modules.py:129)
        lx = jnp.clip(refx + offsets[:, :, :, 0, :] / h, 0.0, 1.0)
        ly = jnp.clip(refy + offsets[:, :, :, 1, :] / h, 0.0, 1.0)

        v = nn.Dense(
            c,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="value_proj",
        )(value)
        # channel-major per-head value maps: (B*nh, dh, N)
        v_cm = jnp.transpose(v, (0, 2, 1)).reshape(b * nh, dh, n)

        pre = deformable_sample_combine_xy(
            v_cm,
            lx.reshape(b * nh, npts, n),
            ly.reshape(b * nh, npts, n),
            attn.reshape(b * nh, npts, n),
            h,
            w,
            impl=self.sampling_impl,
            prefold=True,
            keep_pad=True,
        )  # (B*nh, N_pad, 4*dh) — quadrant groups folded by the projection
        n_pad = pre.shape[1]
        out = FoldingDense(c, nh, dtype=self.dtype, name="output_proj")(
            pre.reshape(b, nh, n_pad, 4 * dh)
        )
        return out[:, :n] if n_pad != n else out


class TransformerEncoderLayer(nn.Module):
    """Deformable self-attn + GELU FFN, post-norm (reference :170-215)."""

    d_model: int = 256
    n_heads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos_flat, reference_points, train: bool = False):
        q = src + pos_flat
        src2 = DeformableAttention(
            self.d_model, self.n_heads, dtype=self.dtype, name="self_attn"
        )(q, src, reference_points)
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        linear1 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")
        linear2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        # batch-sharding hints at the residual adds: without them the SPMD
        # partitioner falls back to full replication of the (B, N, C)
        # activations under a mesh (VERDICT r3 item 2); no-ops single-chip
        u = constrain_batch(src + nn.Dropout(self.dropout, deterministic=not train)(src2))

        if (
            not train
            and ffn_pallas.enabled_for_backend()
            and ffn_pallas.supports(self.d_model, self.dim_feedforward)
        ):
            # Inference tail fused into one Pallas kernel (norm1 -> FFN ->
            # residual -> norm2; see ops.ffn_pallas). Zero-width calls
            # materialize the identical param tree the XLA path would.
            _ = norm2(norm1(u[:, :0]))
            _ = linear2(linear1(u[:, :0]))
            p = lambda m, k: m.variables["params"][k]
            return constrain_batch(ffn_pallas.fused_ffn_ln(
                u,
                p(linear1, "kernel"), p(linear1, "bias"),
                p(linear2, "kernel"), p(linear2, "bias"),
                p(norm1, "scale"), p(norm1, "bias"),
                p(norm2, "scale"), p(norm2, "bias"),
                compute_dtype=self.dtype,
            ))

        src = norm1(u)
        y = linear1(src)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = linear2(y)
        src = constrain_batch(src + nn.Dropout(self.dropout, deterministic=not train)(y))
        return norm2(src)


class LightweightBEVTransformer(nn.Module):
    """Single-layer BEV refinement transformer (reference :218-263).
    Input/output (B, H, W, C) NHWC."""

    d_model: int = 256
    n_heads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        pos = jnp.asarray(
            sine_position_embedding(h, w, self.d_model // 2), dtype=x.dtype
        ).reshape(1, h * w, c)
        xf = x.reshape(b, h * w, c)
        # normalized meshgrid reference points, (gx, gy) order
        ys = np.linspace(0, 1, h, dtype=np.float32)
        xs = np.linspace(0, 1, w, dtype=np.float32)
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        ref = jnp.asarray(np.stack([gx, gy], axis=-1).reshape(h * w, 2))
        y = TransformerEncoderLayer(
            self.d_model,
            self.n_heads,
            self.dim_feedforward,
            self.dropout,
            dtype=self.dtype,
            name="encoder",
        )(xf, pos, ref, train)
        return y.reshape(b, h, w, c)
