"""nu-A2D dataset (reference src/data.py, data_pretrain.py, data_test.py).

Host-side numpy/PIL pipeline producing the exact 7-/9-tuples of the
reference, as a dict batch for the jitted step:
  imgs (N,H,W,3 normalized f32), rots/trans/intrins/post_rots/post_trans,
  binimg (200,200 int), act (4,), desc (8,).

Differences from the reference are TPU-facing only:
  * images come out NHWC (not NCHW);
  * one dataset class parameterized by (split_family, with_txt, split) instead
    of three copy-pasted modules (data.py / data_pretrain.py / data_test.py).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..config import AugConfig, GridConfig
from ..core.augment import (
    accumulate_post_transform,
    expand_to_3x3,
    sample_augmentation,
)
from ..core.grid import gen_dx_bx
from .nuscenes_index import (
    NuScenesIndex,
    box_bottom_corners,
    quaternion_inverse,
    quaternion_rotation_matrix,
)
from .splits import create_splits_scenes

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_img(img: Image.Image) -> np.ndarray:
    """ToTensor + ImageNet Normalize (tools.py:165-169), NHWC output."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return (arr[..., :3] - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_img(arr: np.ndarray) -> Image.Image:
    """Inverse of normalize_img (tools.py:145-162)."""
    x = arr * IMAGENET_STD + IMAGENET_MEAN
    return Image.fromarray((np.clip(x, 0, 1) * 255).astype(np.uint8))


def fill_poly(img: np.ndarray, pts: np.ndarray, value: float) -> None:
    """cv2.fillPoly equivalent (falls back to a numpy scanline rasterizer if
    cv2 is unavailable). pts: (K, 2) int32 (x, y) polygon."""
    try:
        import cv2

        cv2.fillPoly(img, [pts.astype(np.int32)], value)
        return
    except ImportError:
        pass
    # scanline fill (even-odd), matching cv2's inclusive behavior closely
    h, w = img.shape[:2]
    ys = pts[:, 1].astype(np.float64)
    xs = pts[:, 0].astype(np.float64)
    y0, y1 = max(int(np.floor(ys.min())), 0), min(int(np.ceil(ys.max())), h - 1)
    k = len(pts)
    for y in range(y0, y1 + 1):
        crossings = []
        for i in range(k):
            x_a, y_a = xs[i], ys[i]
            x_b, y_b = xs[(i + 1) % k], ys[(i + 1) % k]
            if (y_a <= y < y_b) or (y_b <= y < y_a):
                t = (y - y_a) / (y_b - y_a)
                crossings.append(x_a + t * (x_b - x_a))
        crossings.sort()
        for j in range(0, len(crossings) - 1, 2):
            a = max(int(np.ceil(crossings[j])), 0)
            b = min(int(np.floor(crossings[j + 1])), w - 1)
            if a <= b:
                img[y, a : b + 1] = value


def img_transform(
    img: Image.Image, params
) -> Tuple[Image.Image, np.ndarray, np.ndarray]:
    """PIL resize -> crop -> flip -> rotate + affine bookkeeping
    (reference tools.py:118-142)."""
    img = img.resize(params.resize_dims)
    img = img.crop(params.crop)
    if params.flip:
        img = img.transpose(method=Image.FLIP_LEFT_RIGHT)
    img = img.rotate(params.rotate)
    post_rot2, post_tran2 = accumulate_post_transform(params)
    return img, post_rot2, post_tran2


class NuA2DDataset:
    """Map-style dataset over nu-A2D keyframes."""

    def __init__(
        self,
        nusc: NuScenesIndex,
        is_train: bool,
        aug: AugConfig,
        grid: GridConfig,
        data_root: str,
        split: Optional[str] = None,  # override: 'train'|'val'|'test'
        split_family: str = "nu_a2d",
        with_txt: bool = True,
        rng: Optional[np.random.Generator] = None,
    ):
        self.nusc = nusc
        self.is_train = is_train
        self.aug = aug
        self.grid = grid
        self.dataroot = data_root
        self.with_txt = with_txt
        # Augmentation randomness: np.random.Generator is NOT thread-safe and
        # the loader uses threads, so we derive a fresh per-item generator
        # from (seed, epoch, index). seed=None keeps the reference's
        # intentional OS-entropy non-determinism (train.py:47 reseeds each
        # epoch); passing an rng/seed gives reproducible augmentation.
        if rng is None:
            self._seed = None
        elif isinstance(rng, (int, np.integer)):
            self._seed = int(rng)
        else:
            self._seed = int(rng.integers(0, 2**31 - 1))
        self._epoch = 0

        if split is None:
            split = {
                "v1.0-trainval": {True: "train", False: "val"},
                "v1.0-mini": {True: "mini_train", False: "mini_val"},
            }[nusc.version][is_train]
        self.scenes = create_splits_scenes(split_family)[split]
        self.ixes = self._prepro()
        self.dx, self.bx, self.nx = gen_dx_bx(grid.xbound, grid.ybound, grid.zbound)
        self._fix_nuscenes_formatting()

    def set_epoch(self, epoch: int):
        """Advance the augmentation stream (called by the loader per epoch)."""
        self._epoch = int(epoch)

    def _item_rng(self, index: int) -> np.random.Generator:
        if self._seed is None:
            return np.random.default_rng()
        return np.random.default_rng((self._seed, self._epoch, index))

    def _fix_nuscenes_formatting(self):
        """Path self-healing for sharded storage layouts
        (reference src/data.py:33-65): if `samples/CAM_X/f.jpg` is missing,
        look for `samples/<shard>/samples/CAM_X/f.jpg` and rewrite filenames."""
        if not self.ixes:
            return
        from glob import glob

        rec = self.ixes[0]
        samp = self.nusc.get("sample_data", rec["data"][self.aug.cams[1]])
        if os.path.isfile(os.path.join(self.nusc.dataroot, samp["filename"])):
            return
        print("adjusting nuscenes file paths")
        info = {}
        pats = [
            os.path.join(self.nusc.dataroot, "samples/*/samples/CAM*/*.jpg"),
            os.path.join(self.nusc.dataroot, "samples/*/samples/LIDAR_TOP/*.pcd.bin"),
            os.path.join(self.nusc.dataroot, "sweeps/*/sweeps/LIDAR_TOP/*.pcd.bin"),
        ]
        for pat in pats:
            for f in glob(pat):
                parts = f.split(os.sep)
                di, fi = parts[-2], parts[-1]
                rel = os.sep.join(parts[-5:])
                top = parts[-5]  # 'samples' or 'sweeps'
                info[f"{top}/{di}/{fi}"] = rel
        for sd in self.nusc.sample_data:
            key = sd["filename"]
            if key in info:
                sd["filename"] = info[key]

    def _prepro(self) -> List[dict]:
        samples = [
            s
            for s in self.nusc.sample
            if self.nusc.get("scene", s["scene_token"])["name"] in self.scenes
        ]
        samples.sort(key=lambda x: (x["scene_token"], x["timestamp"]))
        return samples

    def __len__(self) -> int:
        return len(self.ixes)

    def get_image_data(self, rec: dict, cams: Sequence[str], rng=None):
        rng = rng if rng is not None else np.random.default_rng()
        imgs, rots, trans, intrins, post_rots, post_trans = [], [], [], [], [], []
        for cam in cams:
            samp = self.nusc.get("sample_data", rec["data"][cam])
            img = Image.open(os.path.join(self.nusc.dataroot, samp["filename"]))
            sens = self.nusc.get("calibrated_sensor", samp["calibrated_sensor_token"])
            intrin = np.asarray(sens["camera_intrinsic"], dtype=np.float32)
            rot = quaternion_rotation_matrix(sens["rotation"]).astype(np.float32)
            tran = np.asarray(sens["translation"], dtype=np.float32)

            params = sample_augmentation(self.aug, self.is_train, rng)
            img, pr2, pt2 = img_transform(img, params)
            pr3, pt3 = expand_to_3x3(pr2, pt2)

            imgs.append(normalize_img(img))
            intrins.append(intrin)
            rots.append(rot)
            trans.append(tran)
            post_rots.append(pr3)
            post_trans.append(pt3)
        return (
            np.stack(imgs),
            np.stack(rots),
            np.stack(trans),
            np.stack(intrins),
            np.stack(post_rots),
            np.stack(post_trans),
        )

    def get_binimg(self, rec: dict) -> np.ndarray:
        """Precomputed map raster + vehicle footprints (reference
        src/data.py:166-203): classes {0 bg, 1 vehicle, 2 drivable, 3 divider}."""
        egopose = self.nusc.get(
            "ego_pose",
            self.nusc.get("sample_data", rec["data"]["LIDAR_TOP"])["ego_pose_token"],
        )
        trans = -np.array(egopose["translation"])
        rot_inv = quaternion_inverse(egopose["rotation"])

        img = np.zeros((int(self.nx[0]), int(self.nx[1])), dtype=np.float64)
        map_path = os.path.join(self.dataroot, "local_binmap", rec["token"] + ".npy")
        map_np = np.load(map_path)
        map_np = np.rot90(np.fliplr(map_np), 1).astype(float)
        if map_np.shape != img.shape:
            # binmaps are generated offline at the canonical 200x200 grid; for
            # non-default grids (e.g. tiny dry runs) take the ego-centred crop
            oy = (map_np.shape[0] - img.shape[0]) // 2
            ox = (map_np.shape[1] - img.shape[1]) // 2
            if oy >= 0 and ox >= 0:
                map_np = map_np[oy : oy + img.shape[0], ox : ox + img.shape[1]]
            else:
                pad_y, pad_x = max(-oy, 0), max(-ox, 0)
                map_np = np.pad(map_np, ((pad_y, pad_y), (pad_x, pad_x)))[
                    : img.shape[0], : img.shape[1]
                ]
        img += map_np

        for tok in rec["anns"]:
            inst = self.nusc.get("sample_annotation", tok)
            if inst["category_name"].split(".")[0] != "vehicle":
                continue
            center = np.asarray(inst["translation"], dtype=np.float64) + trans
            center = quaternion_rotation_matrix(rot_inv) @ center
            pts = box_bottom_corners(center, inst["size"],
                                     _rotate_quat(rot_inv, inst["rotation"])).T
            pts = np.round(
                (pts - self.bx[:2] + self.dx[:2] / 2.0) / self.dx[:2]
            ).astype(np.int32)
            pts[:, [1, 0]] = pts[:, [0, 1]]
            fill_poly(img, pts, 1.0)
        return img.astype(np.int64)

    def get_txt(self, rec: dict) -> Tuple[np.ndarray, np.ndarray]:
        act = json.load(
            open(os.path.join(self.dataroot, "action_all", rec["token"] + ".json"))
        )
        desc = json.load(
            open(os.path.join(self.dataroot, "desc_all", rec["token"] + ".json"))
        )
        return np.asarray(act, np.float32), np.asarray(desc, np.float32)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rec = self.ixes[index]
        assert self.aug.ncams == 6  # reference data.py:229
        imgs, rots, trans, intrins, post_rots, post_trans = self.get_image_data(
            rec, self.aug.cams, self._item_rng(index)
        )
        out = {
            "imgs": imgs,
            "rots": rots,
            "trans": trans,
            "intrins": intrins,
            "post_rots": post_rots,
            "post_trans": post_trans,
            "binimg": self.get_binimg(rec),
        }
        if self.with_txt:
            act, desc = self.get_txt(rec)
            out["act"] = act
            out["desc"] = desc
        return out


def _rotate_quat(q_by, q):
    """Rotate box orientation: Box.rotate does orientation = q_by * q."""
    from .nuscenes_index import quaternion_multiply

    return quaternion_multiply(q_by, q)


class VizDataset(NuA2DDataset):
    """VizData equivalent (reference src/data.py:241-254): adds 3-sweep lidar
    in the ego frame for visualization."""

    def __getitem__(self, index: int):
        from .lidar import get_lidar_data

        out = super().__getitem__(index)
        rec = self.ixes[index]
        pts = get_lidar_data(self.nusc, rec, nsweeps=3, min_distance=2.2)
        out["lidar"] = pts[:3].astype(np.float32)  # x, y, z
        return out
