"""Static camera frustum (reference: src/model_baseline.py:37-48 `create_frustum`).

The frustum is a compile-time constant tensor of (pixel_u, pixel_v, depth) triples
on the *final* (augmented) image plane, one per (depth bin, feature row, feature col).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def create_frustum(
    final_dim: Tuple[int, int],
    dbound: Tuple[float, float, float],
    downsample: int,
) -> np.ndarray:
    """Return frustum of shape (D, fH, fW, 3) float32.

    Last dim holds (x_pixel, y_pixel, depth_metres). D is determined by the
    half-open range [dbound[0], dbound[1]) with step dbound[2] — 41 for the
    canonical (4, 45, 1).
    """
    ogf_h, ogf_w = final_dim
    f_h, f_w = ogf_h // downsample, ogf_w // downsample

    ds = np.arange(*dbound, dtype=np.float32)  # (D,)
    d = ds.shape[0]
    depth = np.broadcast_to(ds[:, None, None], (d, f_h, f_w))
    xs = np.broadcast_to(
        np.linspace(0, ogf_w - 1, f_w, dtype=np.float32)[None, None, :], (d, f_h, f_w)
    )
    ys = np.broadcast_to(
        np.linspace(0, ogf_h - 1, f_h, dtype=np.float32)[None, :, None], (d, f_h, f_w)
    )
    return np.stack([xs, ys, depth], axis=-1).astype(np.float32)
