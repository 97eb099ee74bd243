"""Frustum → ego-frame geometry, fully vectorized jnp (jit/pjit friendly).

Replaces the five copy-pasted implementations in the reference
(src/model_baseline.py:50-70, src/model_BEV_TXT.py:50-70/193-213,
src/model_vovnet_transformer.py:483-511, pre_train_vovnet.py:67-82) with one
functional core. All matmuls are einsums over tiny 3x3 matrices; XLA fuses the
whole thing into the surrounding program.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Geometry matmuls are 3x3 — negligible FLOPs but parity-critical, so force
# full fp32 even on the MXU (whose default f32 path rounds through bf16).
_EXACT = jax.lax.Precision.HIGHEST


def invert_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det).

    jnp.linalg.inv lowers to LU which is wasteful for 3x3 on TPU; the adjugate
    form is a handful of fused VPU ops.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    adj = jnp.stack(
        [
            jnp.stack([co_a, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([co_c, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def get_geometry(
    frustum: jnp.ndarray,
    rots: jnp.ndarray,
    trans: jnp.ndarray,
    intrins: jnp.ndarray,
    post_rots: jnp.ndarray,
    post_trans: jnp.ndarray,
) -> jnp.ndarray:
    """Ego-frame (x, y, z) for every frustum point.

    Args:
      frustum: (D, fH, fW, 3) static — (u, v, depth) on the augmented image.
      rots, intrins, post_rots: (B, N, 3, 3); trans, post_trans: (B, N, 3).
    Returns:
      points: (B, N, D, fH, fW, 3) float32.

    Semantics match reference src/model_baseline.py:50-70: undo the augmentation
    affine, convert (u*d, v*d, d), then rot @ K^-1 plus translation.
    """
    # undo post-aug: p = inv(post_rot) @ (frustum - post_tran)
    pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
    pts = jnp.einsum("bnij,bndhwj->bndhwi", invert_3x3(post_rots), pts, precision=_EXACT)

    # pinhole unprojection: (u, v, d) -> (u*d, v*d, d)
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)

    combine = jnp.einsum("bnij,bnjk->bnik", rots, invert_3x3(intrins), precision=_EXACT)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts, precision=_EXACT)
    return pts + trans[:, :, None, None, None, :]


def ego_to_cam(points, rot, trans, intrins):
    """Ego-frame points (3, N) -> pinhole camera (reference tools.py:78-87):
    returns (u*z', v*z' normalized to (u, v, z'))."""
    pts = points - trans[:, None]
    pts = rot.T @ pts
    pts = intrins @ pts
    return jnp.concatenate([pts[:2] / pts[2:3], pts[2:3]], axis=0)


def cam_to_ego(points, rot, trans, intrins):
    """Pinhole (u, v, depth) points (3, N) -> ego frame (tools.py:90-100)."""
    pts = jnp.concatenate([points[:2] * points[2:3], points[2:3]], axis=0)
    pts = invert_3x3(intrins) @ pts
    pts = rot @ pts
    return pts + trans[:, None]


def get_only_in_img_mask(pts, h, w):
    """Visibility mask for projected points (3, N) (tools.py:103-108)."""
    return (
        (pts[2] > 0)
        & (pts[0] > 1) & (pts[0] < w - 1)
        & (pts[1] > 1) & (pts[1] < h - 1)
    )


def voxel_indices(
    geom: jnp.ndarray,
    dx: np.ndarray,
    bx: np.ndarray,
    nx: np.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize ego-frame points to integer voxel coords + validity mask.

    Matches torch `((geom - (bx - dx/2)) / dx).long()` (model_baseline.py:92):
    torch .long() truncates toward zero, so we use astype(int32) (same
    semantics), NOT floor. Validity replaces the reference's dynamic boolean
    filter (model_baseline.py:99-103) so shapes stay static under jit.

    Returns:
      idx: (..., 3) int32 voxel coordinates.
      valid: (...,) bool, True where the point lands inside the grid.
    """
    dxj = jnp.asarray(dx, dtype=geom.dtype)
    bxj = jnp.asarray(bx, dtype=geom.dtype)
    idx = ((geom - (bxj - dxj / 2.0)) / dxj).astype(jnp.int32)
    nxj = jnp.asarray(nx, dtype=jnp.int32)
    valid = jnp.all((idx >= 0) & (idx < nxj), axis=-1)
    return idx, valid
