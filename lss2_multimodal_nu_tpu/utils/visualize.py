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


# ---------------------------------------------------------------------------
# matplotlib figure surface (reference tools.py:404-451). The reference
# defines plot_nusc_map/add_ego but never wires them into predict.py; here
# the same axes-level primitives exist AND a composed camera+map+prediction
# figure is provided (the viz the LSS line of work ships).

def add_ego(bx, dx, ax=None):
    """plt.fill the ego footprint in NVIDIA green (tools.py:404-415)."""
    import matplotlib.pyplot as plt

    ax = ax or plt.gca()
    pts = ego_footprint_points(bx, dx)
    ax.fill(pts[:, 0], pts[:, 1], "#76b900")


def plot_local_map(polys, dx, bx, ax=None):
    """Draw a `get_local_map` dict into the current BEV axes with the
    reference's exact colors/alphas (tools.py:429-451): road polys coral at
    0.2, road dividers blue at 0.5, lane dividers purple at 0.5. Note the
    reference plots (y, x) — BEV row/col swap — preserved here."""
    import matplotlib.pyplot as plt

    ax = ax or plt.gca()
    dx2, bx2 = np.asarray(dx)[:2], np.asarray(bx)[:2]
    for name in ("road_segment", "lane"):
        for la in polys.get(name, []):
            pts = (la - bx2) / dx2
            ax.fill(pts[:, 1], pts[:, 0], c=(1.00, 0.50, 0.31), alpha=0.2)
    for la in polys.get("road_divider", []):
        pts = (la - bx2) / dx2
        ax.plot(pts[:, 1], pts[:, 0], c=(0.0, 0.0, 1.0), alpha=0.5)
    for la in polys.get("lane_divider", []):
        pts = (la - bx2) / dx2
        ax.plot(pts[:, 1], pts[:, 0], c=(159.0 / 255.0, 0.0, 1.0), alpha=0.5)


def compose_prediction_figure(
    imgs: np.ndarray,
    bev_pred: np.ndarray,
    bx,
    dx,
    polys: Optional[dict] = None,
    lidar_pts: Optional[np.ndarray] = None,
    cam_names: Optional[list] = None,
    out_path: Optional[str] = None,
):
    """Composed predict-time figure: the 6 normalized camera frames around a
    BEV panel carrying (bottom to top) the local map, an optional lidar
    scatter, the predicted classes, and the ego footprint.

    imgs: (6, H, W, 3) normalized camera tensor (dataset layout);
    bev_pred: (X, Y) int class map; polys: `data.map_gen.get_local_map`
    output; lidar_pts: (3+, N) ego-frame points (`data.lidar.get_lidar_data`).
    Returns the matplotlib Figure (saved to `out_path` if given).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.dataset import denormalize_img

    n = imgs.shape[0]
    fig = plt.figure(figsize=(14, 6))
    gs = fig.add_gridspec(2, n // 2 + 2)
    order = cam_names or [
        "FRONT_LEFT", "FRONT", "FRONT_RIGHT", "BACK_LEFT", "BACK", "BACK_RIGHT"
    ]
    for i in range(n):
        ax = fig.add_subplot(gs[i // (n // 2), i % (n // 2)])
        ax.imshow(denormalize_img(imgs[i]))
        ax.set_title(order[i] if i < len(order) else f"cam{i}", fontsize=8)
        ax.axis("off")
    ax = fig.add_subplot(gs[:, n // 2 :])
    if polys is not None:
        plot_local_map(polys, dx, bx, ax=ax)
    if lidar_pts is not None and lidar_pts.size:
        pts = (lidar_pts[:2].T - np.asarray(bx)[:2]) / np.asarray(dx)[:2]
        ax.scatter(pts[:, 1], pts[:, 0], s=0.2, c="gray", alpha=0.4)
    rgba = np.zeros(bev_pred.shape + (4,), dtype=np.float32)
    color = BEV_PALETTE.astype(np.float32) / 255.0
    for cls in range(1, len(BEV_PALETTE)):
        m = bev_pred == cls
        rgba[m, :3] = color[cls]
        rgba[m, 3] = 0.6
    ax.imshow(rgba, origin="lower")
    add_ego(bx, dx, ax=ax)
    ax.set_xlim(0, bev_pred.shape[1])
    ax.set_ylim(0, bev_pred.shape[0])
    ax.set_aspect("equal")
    ax.set_title("BEV prediction", fontsize=9)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
    return fig
