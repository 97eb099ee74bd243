"""BEV grid bookkeeping (reference: src/tools.py:172-178 `gen_dx_bx`)."""
from __future__ import annotations

from typing import Tuple

import numpy as np


def gen_dx_bx(
    xbound: Tuple[float, float, float],
    ybound: Tuple[float, float, float],
    zbound: Tuple[float, float, float],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (dx, bx, nx): voxel size, first-voxel center, voxel counts.

    Pure numpy — these are static compile-time constants baked into the jitted
    compute graph, never traced.
    """
    bounds = (xbound, ybound, zbound)
    dx = np.array([row[2] for row in bounds], dtype=np.float32)
    bx = np.array([row[0] + row[2] / 2.0 for row in bounds], dtype=np.float32)
    nx = np.array([(row[1] - row[0]) / row[2] for row in bounds], dtype=np.int64)
    return dx, bx, nx
