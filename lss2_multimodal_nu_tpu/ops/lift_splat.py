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

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 'auto' routes to the fused Pallas kernel on TPU (lift_splat_pallas) and the
# XLA segment-sum path elsewhere; 'xla' forces the XLA path (tests/ablation).
_IMPL = "auto"


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_lift_splat_op(feat2, depth_w, seg, fidx, n_voxels):
    """feat2 (B, R, C), depth_w (B, P) validity-masked lift weights,
    seg/fidx (B, P) int32 -> (B, n_voxels, C). Linear in (feat2, depth_w);
    forward runs the fused Pallas kernel, backward the XLA gather (the
    segment-sum VJP == QuickCumsum backward, tools.py:210-218)."""
    from .lift_splat_pallas import fused_lift_splat

    return fused_lift_splat(feat2, depth_w, seg, fidx, n_voxels)


def _fused_fwd(feat2, depth_w, seg, fidx, n_voxels):
    return _fused_lift_splat_op(feat2, depth_w, seg, fidx, n_voxels), (
        feat2, depth_w, seg, fidx,
    )


def _fused_bwd(n_voxels, res, g):
    feat2, depth_w, seg, fidx = res
    b, r, c = feat2.shape
    p = depth_w.shape[1]
    g32 = g.astype(jnp.float32)
    g_rows = jnp.take_along_axis(g32, seg[..., None], axis=1)  # (B, P, C)
    feat_rows = jnp.take_along_axis(
        feat2.astype(jnp.float32), fidx[..., None], axis=1
    )
    ddepth = jnp.einsum("bpc,bpc->bp", g_rows, feat_rows).astype(depth_w.dtype)
    fseg = fidx + (jnp.arange(b, dtype=jnp.int32) * r)[:, None]
    dfeat = jax.ops.segment_sum(
        (depth_w[..., None].astype(jnp.float32) * g_rows).reshape(b * p, c),
        fseg.reshape(b * p),
        num_segments=b * r,
    ).reshape(b, r, c).astype(feat2.dtype)
    f0 = np.zeros(seg.shape, dtype=jax.dtypes.float0)
    return dfeat, ddepth, f0, f0


_fused_lift_splat_op.defvjp(_fused_fwd, _fused_bwd)


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
    X, Y, Z = int(nx[0]), int(nx[1]), int(nx[2])
    P = N * D * fH * fW

    from .lift_splat_pallas import enabled_for_backend

    if _IMPL != "xla" and not camera_chunked and enabled_for_backend() \
            and (Z * X * Y) % 8 == 0:
        # Fused Pallas path: the (B, P, C) frustum tensor never materializes.
        idx_f = idx.reshape(B, P, 3)
        valid_f = valid.reshape(B, P)
        seg = (idx_f[..., 2] * X + idx_f[..., 0]) * Y + idx_f[..., 1]
        seg = jnp.where(valid_f, seg, 0)
        depth_w = jnp.where(valid_f, depth.reshape(B, P), 0).astype(jnp.float32)
        # point p = (n, d, fh, fw) row-major reads feature row (n, fh, fw)
        nn, dd, hh, ww = np.meshgrid(
            np.arange(N), np.arange(D), np.arange(fH), np.arange(fW),
            indexing="ij",
        )
        fidx1 = ((nn * fH + hh) * fW + ww).reshape(P).astype(np.int32)
        fidx = jnp.broadcast_to(jnp.asarray(fidx1)[None], (B, P))
        bev = _fused_lift_splat_op(
            feat.reshape(B, N * fH * fW, C), depth_w, seg, fidx, Z * X * Y
        )  # (B, Z*X*Y, C)
        bev = bev.reshape(B, Z, X, Y, C)
        return jnp.moveaxis(bev, 1, 3).reshape(B, X, Y, Z * C)

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
