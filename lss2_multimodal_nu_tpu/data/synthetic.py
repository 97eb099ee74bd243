"""Synthetic nu-A2D fixture: a tiny on-disk dataset in exact nuScenes format
(JSON tables + camera JPEGs + local_binmap/action_all/desc_all sidecars) so
the data pipeline, CLI, and train loop run hermetically (SURVEY §4(f)).

Uses the mini-split scene names so `version='mini'` works out of the box.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np
from PIL import Image

from .splits import create_splits_scenes

CAMS = (
    "CAM_FRONT_LEFT",
    "CAM_FRONT",
    "CAM_FRONT_RIGHT",
    "CAM_BACK_LEFT",
    "CAM_BACK",
    "CAM_BACK_RIGHT",
)


def _tok(kind: str, i: int) -> str:
    return f"{kind}{i:06d}"


def generate(
    root: str,
    version: str = "v1.0-mini",
    scenes: Optional[List[str]] = None,
    samples_per_scene: int = 2,
    img_hw=(90, 160),
    seed: int = 0,
) -> str:
    """Create the fixture: JSON tables under `root/<version>/`, media and
    sidecars (samples/, local_binmap/, action_all/, desc_all/) directly under
    `root` — the same layout the reference expects for one `dataroot/version`
    directory (data.py:279-287, 166-221). Returns `root`."""
    rng = np.random.default_rng(seed)
    if scenes is None:
        sp = create_splits_scenes("nu_a2d")
        scenes = sp["mini_train"][:2] + sp["mini_val"][:1]
    ver_dir = root
    tbl_dir = os.path.join(root, version)
    os.makedirs(tbl_dir, exist_ok=True)

    sensors, calibs, ego_poses, samples, sample_datas, scene_rows, anns = (
        [], [], [], [], [], [], [])

    # sensors: 6 cams + lidar
    for i, ch in enumerate(list(CAMS) + ["LIDAR_TOP"]):
        sensors.append(
            {"token": _tok("sen", i), "channel": ch,
             "modality": "camera" if ch != "LIDAR_TOP" else "lidar"}
        )

    h, w = img_hw
    fidx = 0
    for si, scene_name in enumerate(scenes):
        scene_tok = _tok("scene", si)
        first = last = None
        for sj in range(samples_per_scene):
            i = si * samples_per_scene + sj
            samp_tok = _tok("samp", i)
            if first is None:
                first = samp_tok
            last = samp_tok
            samples.append(
                {
                    "token": samp_tok,
                    "scene_token": scene_tok,
                    "timestamp": 1_000_000 * (i + 1),
                    "prev": "", "next": "",
                }
            )
            # ego pose
            ego_tok = _tok("ego", i)
            ego_poses.append(
                {
                    "token": ego_tok,
                    "translation": rng.uniform(-100, 100, 3).tolist(),
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                    "timestamp": 1_000_000 * (i + 1),
                }
            )
            # per-camera sample_data + calibrated sensor
            for ci, cam in enumerate(CAMS):
                calib_tok = _tok("cal", fidx)
                intrin = [[1266.0 * w / 1600, 0.0, w / 2],
                          [0.0, 1266.0 * w / 1600, h / 2],
                          [0.0, 0.0, 1.0]]
                yaw = ci * np.pi / 3
                calibs.append(
                    {
                        "token": calib_tok,
                        "sensor_token": _tok("sen", ci),
                        "translation": rng.uniform(-2, 2, 3).tolist(),
                        "rotation": [float(np.cos(yaw / 2)), 0.0, 0.0,
                                     float(np.sin(yaw / 2))],
                        "camera_intrinsic": intrin,
                    }
                )
                fname = f"samples/{cam}/{samp_tok}_{cam}.jpg"
                os.makedirs(os.path.join(ver_dir, "samples", cam), exist_ok=True)
                img = (rng.uniform(0, 255, size=(h, w, 3))).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(ver_dir, fname))
                sample_datas.append(
                    {
                        "token": _tok("sd", fidx),
                        "sample_token": samp_tok,
                        "calibrated_sensor_token": calib_tok,
                        "ego_pose_token": ego_tok,
                        "filename": fname,
                        "is_key_frame": True,
                        "fileformat": "jpg",
                        "timestamp": 1_000_000 * (i + 1),
                    }
                )
                fidx += 1
            # lidar sample_data (pose carrier for get_binimg)
            calib_tok = _tok("cal", fidx)
            calibs.append(
                {
                    "token": calib_tok,
                    "sensor_token": _tok("sen", 6),
                    "translation": [0.0, 0.0, 1.8],
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                    "camera_intrinsic": [],
                }
            )
            lidar_fname = f"samples/LIDAR_TOP/{samp_tok}.pcd.bin"
            os.makedirs(os.path.join(ver_dir, "samples", "LIDAR_TOP"), exist_ok=True)
            pts = rng.uniform(-40, 40, size=(128, 5)).astype(np.float32)
            pts[:, 3] = rng.uniform(0, 255, 128)  # intensity
            pts[:, 4] = 0.0  # ring
            pts.tofile(os.path.join(ver_dir, lidar_fname))
            sample_datas.append(
                {
                    "token": _tok("sd", fidx),
                    "sample_token": samp_tok,
                    "calibrated_sensor_token": calib_tok,
                    "ego_pose_token": ego_tok,
                    "filename": lidar_fname,
                    "is_key_frame": True,
                    "fileformat": "pcd",
                    "timestamp": 1_000_000 * (i + 1),
                    "prev": "",
                }
            )
            fidx += 1
            # one vehicle annotation near ego
            ego_t = np.asarray(ego_poses[-1]["translation"])
            anns.append(
                {
                    "token": _tok("ann", i),
                    "sample_token": samp_tok,
                    "category_name": "vehicle.car",
                    "translation": (ego_t + rng.uniform(-20, 20, 3)).tolist(),
                    "size": [2.0, 4.5, 1.6],
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                }
            )
            # sidecar labels
            for d, payload in (
                ("local_binmap", None),
                ("action_all", rng.integers(0, 2, 4).tolist()),
                ("desc_all", rng.integers(0, 2, 8).tolist()),
            ):
                os.makedirs(os.path.join(ver_dir, d), exist_ok=True)
                if d == "local_binmap":
                    m = np.zeros((200, 200), dtype=np.int64)
                    m[60:140, 60:140] = 2
                    m[95:105, :] = 3
                    np.save(os.path.join(ver_dir, d, samp_tok + ".npy"), m)
                else:
                    json.dump(
                        payload, open(os.path.join(ver_dir, d, samp_tok + ".json"), "w")
                    )
        scene_rows.append(
            {
                "token": scene_tok,
                "name": scene_name,
                "first_sample_token": first,
                "last_sample_token": last,
                "nbr_samples": samples_per_scene,
            }
        )

    tables = {
        "scene": scene_rows,
        "sample": samples,
        "sample_data": sample_datas,
        "calibrated_sensor": calibs,
        "ego_pose": ego_poses,
        "sensor": sensors,
        "sample_annotation": anns,
    }
    for name, rows in tables.items():
        json.dump(rows, open(os.path.join(tbl_dir, f"{name}.json"), "w"))
    return root


def generate_map_expansion(root: str, map_name: str = "boston-seaport", seed: int = 0):
    """Write a tiny nuScenes map-expansion JSON (nodes/polygons/lines +
    road_segment/lane/dividers) covering [-150, 150]^2 so map_gen can run."""
    rng = np.random.default_rng(seed)
    nodes, polygons, lines = [], [], []
    road_segments, lanes, road_dividers, lane_dividers = [], [], [], []

    def add_node(x, y):
        tok = _tok("node", len(nodes))
        nodes.append({"token": tok, "x": float(x), "y": float(y)})
        return tok

    def add_rect_poly(cx, cy, w, h):
        toks = [
            add_node(cx - w / 2, cy - h / 2),
            add_node(cx + w / 2, cy - h / 2),
            add_node(cx + w / 2, cy + h / 2),
            add_node(cx - w / 2, cy + h / 2),
        ]
        ptok = _tok("poly", len(polygons))
        polygons.append({"token": ptok, "exterior_node_tokens": toks, "holes": []})
        return ptok

    for i in range(4):
        cx, cy = rng.uniform(-120, 120, 2)
        p = add_rect_poly(cx, cy, rng.uniform(40, 90), rng.uniform(40, 90))
        road_segments.append({"token": _tok("rs", i), "polygon_token": p})
    for i in range(3):
        cx, cy = rng.uniform(-120, 120, 2)
        p = add_rect_poly(cx, cy, rng.uniform(10, 30), rng.uniform(60, 120))
        lanes.append({"token": _tok("lane", i), "polygon_token": p})
    for i in range(3):
        x0, y0 = rng.uniform(-120, 120, 2)
        toks = [add_node(x0 + 10 * k, y0 + rng.uniform(-2, 2)) for k in range(8)]
        ltok = _tok("line", len(lines))
        lines.append({"token": ltok, "node_tokens": toks})
        (road_dividers if i % 2 == 0 else lane_dividers).append(
            {"token": _tok("div", i), "line_token": ltok}
        )

    data = {
        "node": nodes, "polygon": polygons, "line": lines,
        "road_segment": road_segments, "lane": lanes,
        "road_divider": road_dividers, "lane_divider": lane_dividers,
    }
    out = os.path.join(root, "maps", "expansion")
    os.makedirs(out, exist_ok=True)
    json.dump(data, open(os.path.join(out, f"{map_name}.json"), "w"))
    return os.path.join(out, f"{map_name}.json")
