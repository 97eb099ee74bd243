"""Lift-splat: depth-distribution outer product + voxel pooling ("splat").

TPU-native redesign of the reference's QuickCumsum path
(src/tools.py:181-218 + src/model_baseline.py:84-126):

* The reference dynamically filters out-of-bounds points (`x = x[kept]`),
  argsorts by voxel rank, runs a sorted cumsum, keeps run boundaries, and
  scatters into the dense grid. All of that is shape-dynamic and
  sort-bound — hostile to XLA.
* Here every point keeps a static slot; out-of-bounds points are routed to a
  dump segment that is sliced off. `jax.ops.segment_sum` performs the
  scatter-add; its VJP (a gather) is exactly QuickCumsum's hand-written
  backward (tools.py:210-218), so autodiff is both correct and efficient —
  no custom_vjp needed.

Numerics: per-voxel *sum* of features, identical (up to fp reassociation) to
the reference's cumsum-difference trick.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def lift(feat: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Depth-distribution outer product (reference src/modules.py:79-86).

    Args:
      feat:  (..., fH, fW, C) image features (NHWC).
      depth: (..., D, fH, fW) softmaxed depth distribution.
    Returns:
      (..., D, fH, fW, C) frustum features.
    """
    return depth[..., None] * feat[..., None, :, :, :]


def splat(
    feats: jnp.ndarray,
    idx: jnp.ndarray,
    valid: jnp.ndarray,
    nx: np.ndarray,
) -> jnp.ndarray:
    """Scatter-add frustum features into the dense BEV grid.

    Args:
      feats: (B, P, C) per-point features (P = N*D*fH*fW flattened).
      idx:   (B, P, 3) int32 voxel coords (x, y, z) from core.geometry.voxel_indices.
      valid: (B, P) bool in-bounds mask.
      nx:    static (3,) grid size (X, Y, Z).
    Returns:
      bev: (B, X, Y, Z*C) NHWC, z-major channel order — matches the reference's
      `cat(final.unbind(dim=2), 1)` collapse (model_baseline.py:124) transposed
      to NHWC.
    """
    X, Y, Z = int(nx[0]), int(nx[1]), int(nx[2])
    B, P, C = feats.shape
    seg = (idx[..., 2] * X + idx[..., 0]) * Y + idx[..., 1]
    seg = seg + (jnp.arange(B, dtype=jnp.int32) * (Z * X * Y))[:, None]
    dump = B * Z * X * Y
    seg = jnp.where(valid, seg, dump)
    flat = jax.ops.segment_sum(
        feats.reshape(B * P, C),
        seg.reshape(B * P),
        num_segments=dump + 1,
        indices_are_sorted=False,
        unique_indices=False,
    )
    bev = flat[:dump].reshape(B, Z, X, Y, C)
    return jnp.moveaxis(bev, 1, 3).reshape(B, X, Y, Z * C)


def lift_splat(
    feat: jnp.ndarray,
    depth: jnp.ndarray,
    idx: jnp.ndarray,
    valid: jnp.ndarray,
    nx: np.ndarray,
    camera_chunked: bool = False,
) -> jnp.ndarray:
    """Fused lift + splat over all cameras.

    Args:
      feat:  (B, N, fH, fW, C) per-camera image features.
      depth: (B, N, D, fH, fW) depth distributions.
      idx:   (B, N, D, fH, fW, 3) int32 voxel coords.
      valid: (B, N, D, fH, fW) bool.
      nx:    static (3,) grid size.
      camera_chunked: scan over cameras to cap peak HBM (frustum tensor for one
        camera at a time) at the cost of N sequential segment-sums.
    Returns:
      bev: (B, X, Y, Z*C).
    """
    B, N, D, fH, fW = depth.shape
    C = feat.shape[-1]

    if not camera_chunked:
        pts = lift(feat, depth)  # (B, N, D, fH, fW, C)
        return splat(
            pts.reshape(B, N * D * fH * fW, C),
            idx.reshape(B, N * D * fH * fW, 3),
            valid.reshape(B, N * D * fH * fW),
            nx,
        )

    def body(acc, inputs):
        f, dpt, ix, va = inputs  # per-camera slices, leading dim B
        pts = lift(f, dpt)  # (B, D, fH, fW, C)
        acc = acc + splat(
            pts.reshape(B, D * fH * fW, C),
            ix.reshape(B, D * fH * fW, 3),
            va.reshape(B, D * fH * fW),
            nx,
        )
        return acc, None

    X, Y, Z = int(nx[0]), int(nx[1]), int(nx[2])
    init = jnp.zeros((B, X, Y, Z * C), dtype=feat.dtype)
    acc, _ = jax.lax.scan(
        body,
        init,
        (
            jnp.moveaxis(feat, 1, 0),
            jnp.moveaxis(depth, 1, 0),
            jnp.moveaxis(idx, 1, 0),
            jnp.moveaxis(valid, 1, 0),
        ),
    )
    return acc
