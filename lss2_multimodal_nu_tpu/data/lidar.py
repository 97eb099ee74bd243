"""Lidar sweep aggregation (reference src/tools.py:21-75; viz-only — consumed
by VizData, src/data.py:241-254)."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .nuscenes_index import NuScenesIndex, quaternion_rotation_matrix


def _transform_matrix(translation, rotation, inverse=False) -> np.ndarray:
    tm = np.eye(4)
    r = quaternion_rotation_matrix(rotation)
    t = np.asarray(translation, dtype=np.float64)
    if inverse:
        tm[:3, :3] = r.T
        tm[:3, 3] = -(r.T @ t)
    else:
        tm[:3, :3] = r
        tm[:3, 3] = t
    return tm


def load_pointcloud(path: str) -> np.ndarray:
    """nuScenes .pcd.bin: float32 (x, y, z, intensity, ring) rows -> (5, N)."""
    scan = np.fromfile(path, dtype=np.float32)
    return scan.reshape(-1, 5).T


def remove_close(points: np.ndarray, min_distance: float) -> np.ndarray:
    keep = ~(
        (np.abs(points[0]) < min_distance) & (np.abs(points[1]) < min_distance)
    )
    return points[:, keep]


def get_lidar_data(
    nusc: NuScenesIndex, sample_rec: dict, nsweeps: int, min_distance: float
) -> np.ndarray:
    """At most `nsweeps` of lidar in the reference sample's ego frame.
    Returns (5, N): x, y, z, reflectance, dt."""
    points = np.zeros((5, 0))
    ref_sd = nusc.get("sample_data", sample_rec["data"]["LIDAR_TOP"])
    ref_pose = nusc.get("ego_pose", ref_sd["ego_pose_token"])
    ref_time = 1e-6 * ref_sd["timestamp"]
    car_from_global = _transform_matrix(
        ref_pose["translation"], ref_pose["rotation"], inverse=True
    )

    cur = ref_sd
    for _ in range(nsweeps):
        pc = load_pointcloud(os.path.join(nusc.dataroot, cur["filename"]))
        pc = remove_close(pc, min_distance)

        pose = nusc.get("ego_pose", cur["ego_pose_token"])
        global_from_car = _transform_matrix(pose["translation"], pose["rotation"])
        cs = nusc.get("calibrated_sensor", cur["calibrated_sensor_token"])
        car_from_current = _transform_matrix(cs["translation"], cs["rotation"])

        tm = car_from_global @ global_from_car @ car_from_current
        xyz1 = np.vstack([pc[:3], np.ones((1, pc.shape[1]))])
        pc[:3] = (tm @ xyz1)[:3]

        time_lag = ref_time - 1e-6 * cur["timestamp"]
        pc[4] = time_lag  # reuse ring slot as dt, matching the 5th channel
        points = np.concatenate([points, pc], axis=1)
        if not cur.get("prev"):
            break
        cur = nusc.get("sample_data", cur["prev"])
    return points
