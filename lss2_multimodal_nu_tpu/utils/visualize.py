"""Visualization helpers (reference L6: src/tools.py:404-451 + predict-time
viz). Headless (Agg) by design."""
from __future__ import annotations

from typing import Optional

import numpy as np

# class colors: bg, vehicle, drivable, divider
BEV_PALETTE = np.array(
    [
        [255, 255, 255],
        [0, 120, 255],
        [255, 127, 80],
        [159, 0, 255],
    ],
    dtype=np.uint8,
)


def ego_footprint_points(bx, dx) -> np.ndarray:
    """Ego-car footprint polygon in BEV pixel coords (tools.py:404-415)."""
    W = 1.85
    pts = np.array(
        [
            [-4.084 / 2.0 + 0.5, W / 2.0],
            [4.084 / 2.0 + 0.5, W / 2.0],
            [4.084 / 2.0 + 0.5, -W / 2.0],
            [-4.084 / 2.0 + 0.5, -W / 2.0],
        ]
    )
    pts = (pts - np.asarray(bx)[:2]) / np.asarray(dx)[:2]
    pts[:, [0, 1]] = pts[:, [1, 0]]
    return pts


def bev_to_rgb(bev_classes: np.ndarray, draw_ego: bool = True, bx=None, dx=None) -> np.ndarray:
    """(X, Y) int class map -> (X, Y, 3) uint8 image."""
    img = BEV_PALETTE[np.clip(bev_classes, 0, len(BEV_PALETTE) - 1)]
    if draw_ego and bx is not None:
        from ..data.dataset import fill_poly

        canvas = img[..., 0].astype(np.float64)
        marker = canvas.copy()
        fill_poly(marker, ego_footprint_points(bx, dx).astype(np.int32), -1.0)
        mask = marker < 0
        img = img.copy()
        img[mask] = [118, 185, 0]  # '#76b900' (tools.py:415)
    return img


def save_bev_png(path: str, bev_classes: np.ndarray, bx=None, dx=None):
    from PIL import Image

    Image.fromarray(bev_to_rgb(bev_classes, bx is not None, bx, dx)).save(path)


def side_by_side(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    sep = np.full((pred.shape[0], 4, 3), 64, dtype=np.uint8)
    return np.concatenate([bev_to_rgb(pred), sep, bev_to_rgb(gt)], axis=1)
