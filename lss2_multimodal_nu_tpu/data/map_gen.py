"""Offline BEV map-GT generation (reference src/tools.py:418-534).

Reimplements the slice of nuscenes-devkit's NuScenesMap API the reference
uses — polygon/line record lookup in a patch, local-frame transform — on top
of the raw map-expansion JSON, then rasterizes drivable area (class 2) and
dividers (class 3) into the 200x200 `local_binmap/<token>.npy` rasters the
training pipeline consumes (src/data.py:174-179).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np

from ..core.augment import get_rot
from .dataset import fill_poly
from .nuscenes_index import NuScenesIndex, quaternion_rotation_matrix

POLY_LAYERS = ("road_segment", "lane")
LINE_LAYERS = ("road_divider", "lane_divider")


class NuScenesMapLite:
    """Minimal map-expansion JSON reader (one map location)."""

    def __init__(self, dataroot: str, map_name: str):
        path = os.path.join(dataroot, "maps", "expansion", f"{map_name}.json")
        self._data = json.load(open(path))
        self._nodes = {n["token"]: (n["x"], n["y"]) for n in self._data.get("node", [])}
        self._polygons = {p["token"]: p for p in self._data.get("polygon", [])}
        self._lines = {l["token"]: l for l in self._data.get("line", [])}
        self._layers: Dict[str, List[dict]] = {
            name: self._data.get(name, []) for name in POLY_LAYERS + LINE_LAYERS
        }
        # precompute polygon exteriors + bounds
        self._poly_pts: Dict[str, np.ndarray] = {}
        for tok, poly in self._polygons.items():
            pts = np.array(
                [self._nodes[t] for t in poly.get("exterior_node_tokens", [])],
                dtype=np.float64,
            )
            if len(pts):
                self._poly_pts[tok] = pts
        self._line_pts: Dict[str, np.ndarray] = {}
        for tok, line in self._lines.items():
            pts = np.array(
                [self._nodes[t] for t in line.get("node_tokens", [])], dtype=np.float64
            )
            if len(pts):
                self._line_pts[tok] = pts

    def extract_polygon(self, token: str) -> np.ndarray:
        return self._poly_pts.get(token, np.zeros((0, 2)))

    def extract_line(self, token: str) -> np.ndarray:
        return self._line_pts.get(token, np.zeros((0, 2)))

    def records_in_patch(self, box, layer_names: Sequence[str]) -> Dict[str, List[str]]:
        """Intersect-mode bounding-box test (devkit get_records_in_patch)."""
        x0, y0, x1, y1 = box
        out: Dict[str, List[str]] = {}
        for name in layer_names:
            toks = []
            for rec in self._layers[name]:
                ptoks = (
                    [rec["polygon_token"]] if "polygon_token" in rec
                    else rec.get("polygon_tokens", [])
                )
                for pt in ptoks:
                    pts = self._poly_pts.get(pt)
                    if pts is None or not len(pts):
                        continue
                    if (
                        pts[:, 0].max() >= x0 and pts[:, 0].min() <= x1
                        and pts[:, 1].max() >= y0 and pts[:, 1].min() <= y1
                    ):
                        toks.append(rec["token"])
                        break
            out[name] = toks
        return out


def get_local_map(nmap: NuScenesMapLite, center, stretch: float):
    """Reference tools.py:484-534: polygons + divider lines in the ego-centred
    patch, rotated into the local frame."""
    box = (center[0] - stretch, center[1] - stretch, center[0] + stretch, center[1] + stretch)
    polys: Dict[str, List[np.ndarray]] = {}
    recs = nmap.records_in_patch(box, POLY_LAYERS)
    for layer in POLY_LAYERS:
        polys[layer] = []
        for tok in recs[layer]:
            rec = next(r for r in nmap._layers[layer] if r["token"] == tok)
            ptoks = (
                [rec["polygon_token"]] if "polygon_token" in rec
                else rec.get("polygon_tokens", [])
            )
            for pt in ptoks:
                arr = nmap.extract_polygon(pt)
                if len(arr):
                    polys[layer].append(arr.copy())
    for layer in LINE_LAYERS:
        polys[layer] = []
        for rec in nmap._layers[layer]:
            arr = nmap.extract_line(rec["line_token"]) if "line_token" in rec else None
            if arr is not None and len(arr):
                polys[layer].append(arr.copy())
    rot = get_rot(np.arctan2(center[3], center[2])).T
    for layer in polys:
        for i in range(len(polys[layer])):
            polys[layer][i] = (polys[layer][i] - center[:2]) @ rot
    return polys


def rasterize_local_map(polys, dx, bx, size=(200, 200)) -> np.ndarray:
    """Reference save_nusc_map (tools.py:453-479): drivable=2, dividers=3."""
    backg = np.zeros(size, dtype=np.float64)
    for layer in POLY_LAYERS:
        for la in polys[layer]:
            pts = np.round((la - bx[:2]) / dx[:2]).astype(np.int32)
            fill_poly(backg, pts, 2.0)
    for layer in LINE_LAYERS:
        for la in polys[layer]:
            pts = np.round((la - bx[:2]) / dx[:2]).astype(np.int32)
            fill_poly(backg, pts, 3.0)
    return backg.astype(int)


def generate_binmaps(
    nusc: NuScenesIndex,
    map_root: str,
    scene_to_map: Dict[str, str],
    out_dir: str,
    dx,
    bx,
) -> int:
    """Offline generator for local_binmap/*.npy over all samples."""
    os.makedirs(out_dir, exist_ok=True)
    maps: Dict[str, NuScenesMapLite] = {}
    n = 0
    for rec in nusc.sample:
        scene = nusc.get("scene", rec["scene_token"])["name"]
        map_name = scene_to_map[scene]
        if map_name not in maps:
            maps[map_name] = NuScenesMapLite(map_root, map_name)
        ego = nusc.get(
            "ego_pose", nusc.get("sample_data", rec["data"]["LIDAR_TOP"])["ego_pose_token"]
        )
        r = quaternion_rotation_matrix(ego["rotation"])
        yaw = np.arctan2(r[1, 0], r[0, 0])
        center = np.array(
            [ego["translation"][0], ego["translation"][1], np.cos(yaw), np.sin(yaw)]
        )
        polys = get_local_map(maps[map_name], center, 50.0)
        raster = rasterize_local_map(polys, np.asarray(dx), np.asarray(bx))
        np.save(os.path.join(out_dir, rec["token"] + ".npy"), raster)
        n += 1
    return n
