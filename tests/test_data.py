"""Data-pipeline tests on the synthetic nu-A2D fixture + geometry-helper
parity (quaternions, box corners, rasterizer, PIL augmentation affine)."""
import os

import numpy as np
import pytest
from PIL import Image

from lss2_multimodal_nu_tpu.config import AugConfig, GridConfig
from lss2_multimodal_nu_tpu.core.augment import AugParams, sample_augmentation
from lss2_multimodal_nu_tpu.data.dataset import (
    NuA2DDataset,
    fill_poly,
    img_transform,
    normalize_img,
)
from lss2_multimodal_nu_tpu.data.loader import DataLoader
from lss2_multimodal_nu_tpu.data.nuscenes_index import (
    NuScenesIndex,
    box_bottom_corners,
    quaternion_inverse,
    quaternion_multiply,
    quaternion_rotation_matrix,
)
from lss2_multimodal_nu_tpu.data.splits import create_splits_scenes
from lss2_multimodal_nu_tpu.data.synthetic import generate


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nu_a2d_fixture"))
    generate(root, samples_per_scene=3)
    return root


def test_splits_shapes():
    sp = create_splits_scenes("nu_a2d")
    assert len(sp["train"]) == 200 and len(sp["val"]) == 50 and len(sp["test"]) == 50
    full = create_splits_scenes("nuscenes_full")
    assert len(full["train"]) > 200


def test_quaternion_helpers():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    R = quaternion_rotation_matrix(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, rtol=1e-10)
    qi = quaternion_inverse(q)
    np.testing.assert_allclose(
        quaternion_rotation_matrix(qi), R.T, atol=1e-10
    )
    qq = quaternion_multiply(q, qi)
    np.testing.assert_allclose(qq, [1, 0, 0, 0], atol=1e-10)


def test_box_bottom_corners_axis_aligned():
    # identity orientation: l along x, w along y, bottom z
    pts = box_bottom_corners(np.array([10.0, 5.0, 1.0]), [2.0, 4.0, 1.5], [1, 0, 0, 0])
    assert pts.shape == (2, 4)
    xs, ys = pts
    np.testing.assert_allclose(sorted(set(np.round(xs, 6))), [8.0, 12.0])
    np.testing.assert_allclose(sorted(set(np.round(ys, 6))), [4.0, 6.0])


def test_fill_poly_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    for _ in range(5):
        pts = rng.integers(2, 38, size=(4, 2)).astype(np.int32)
        a = np.zeros((40, 40))
        b = np.zeros((40, 40))
        fill_poly(a, pts, 1.0)  # dispatches to cv2 when available
        cv2.fillPoly(b, [pts], 1.0)
        np.testing.assert_array_equal(a, b)


def test_img_transform_affine_consistency():
    """A source-pixel landmark mapped by (post_rot, post_tran) must land on the
    transformed pixel location in the output image."""
    src = Image.new("RGB", (1600, 900))
    arr = np.zeros((900, 1600, 3), np.uint8)
    arr[450:454, 800:804] = 255
    src = Image.fromarray(arr)
    params = AugParams(
        resize=0.22, resize_dims=(352, 198), crop=(0, 70, 352, 198), flip=True,
        rotate=0.0,
    )
    out, pr, pt = img_transform(src, params)
    target = pr @ np.array([802.0, 452.0]) + pt
    out_arr = np.asarray(out).sum(-1)
    ys, xs = np.nonzero(out_arr > 100)
    cx, cy = xs.mean(), ys.mean()
    assert abs(cx - target[0]) < 2.0 and abs(cy - target[1]) < 2.0


def test_fixture_geometric_consistency(tmp_path):
    """The learnable fixture's three label surfaces agree (VERDICT r2 item 8):
    (a) the stored local_binmap round-trips through get_binimg's fliplr+rot90
    to the authored ego-frame raster exactly; (b) ground points projected
    through the dataset's OWN rots/trans/intrins/post_* land on pixels of
    their class colour — i.e. BEV labels are recoverable from the images
    through the same camera model the LSS lift uses."""
    from lss2_multimodal_nu_tpu.data import synthetic
    from lss2_multimodal_nu_tpu.data.dataset import denormalize_img

    root = str(tmp_path / "fix")
    scenes = []
    generate(root, samples_per_scene=2, scenes_out=scenes)
    nusc = NuScenesIndex("v1.0-mini", root)
    ds = NuA2DDataset(
        nusc, is_train=False, aug=AugConfig(H=90, W=160), grid=GridConfig(),
        data_root=root,
    )
    rec = ds.ixes[0]
    scene = dict(scenes)[rec["token"]]

    # (a) binmap round-trip: non-vehicle classes of binimg == authored raster
    binimg = ds.get_binimg(rec)
    ego = synthetic._scene_raster(scene, 200, 0.5, vehicles=False)
    assert np.array_equal(np.where(binimg == 1, ego, binimg), ego)
    assert (binimg == 1).sum() > 0  # annotations rasterized some vehicle px

    # (b) image<->label consistency through the real pipeline (JPEG + noise
    # + augmentation): project random ground points into every camera and
    # compare pixel colour to the class colour
    item = ds[0]
    imgs, rots, trans = item["imgs"], item["rots"], item["trans"]
    intr, pr, pt = item["intrins"], item["post_rots"], item["post_trans"]
    fine = synthetic._scene_raster(scene, 400, 0.25, vehicles=True)
    rng = np.random.default_rng(1)
    ang = rng.uniform(0, 2 * np.pi, 4000)
    r = rng.uniform(5, 40, 4000)
    g = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros_like(r)], -1)
    ix = np.floor((g[:, 0] + 50) / 0.25).astype(int)
    iy = np.floor((g[:, 1] + 50) / 0.25).astype(int)
    cls = fine[np.clip(ix, 0, 399), np.clip(iy, 0, 399)]
    H, W = imgs.shape[1:3]
    hits = good = 0
    for c in range(6):
        pc = (g - trans[c]) @ rots[c]
        z = pc[:, 2]
        uv = (intr[c] @ (pc.T / np.maximum(z, 1e-6))).T[:, :2]
        uvw = np.concatenate([uv, np.ones((len(uv), 1))], 1)
        uv2 = (pr[c] @ uvw.T).T[:, :2] + pt[c][:2]
        m = (z > 0.5) & (uv2[:, 0] >= 1) & (uv2[:, 0] < W - 1) \
            & (uv2[:, 1] >= 1) & (uv2[:, 1] < H - 1)
        px = imgs[c][np.round(uv2[m, 1]).astype(int),
                     np.round(uv2[m, 0]).astype(int)]
        pix = np.asarray(
            denormalize_img(px.reshape(-1, 1, 3)), dtype=np.float32
        ).reshape(-1, 3)
        d = np.linalg.norm(pix - synthetic._COLORS[cls[m]], axis=1)
        hits += len(d)
        good += int((d < 60).sum())
    assert hits > 1500  # every sample is seen by several cameras
    assert good / hits > 0.85  # boundary pixels may straddle classes


def test_index_missing_tables_raises(tmp_path):
    """A wrong dataroot/version must fail loudly, not yield zero batches
    (regression: bare StopIteration deep inside run_training)."""
    with pytest.raises(FileNotFoundError, match="sample.json"):
        NuScenesIndex("v1.0-mini", str(tmp_path / "nowhere"))


def test_index_and_dataset(fixture_root):
    nusc = NuScenesIndex("v1.0-mini", fixture_root)
    ds = NuA2DDataset(
        nusc, is_train=True, aug=AugConfig(H=90, W=160), grid=GridConfig(),
        data_root=fixture_root, rng=np.random.default_rng(0),
    )
    assert len(ds) == 6  # 2 mini_train scenes x 3 samples
    item = ds[0]
    assert item["imgs"].shape == (6, 128, 352, 3)
    assert item["rots"].shape == (6, 3, 3)
    assert item["binimg"].shape == (200, 200)
    assert set(np.unique(item["binimg"])) <= {0, 1, 2, 3}
    assert item["act"].shape == (4,) and item["desc"].shape == (8,)
    # binimg contains drivable area from the binmap and at least tries vehicles
    assert (item["binimg"] == 2).sum() > 0

    val = NuA2DDataset(
        nusc, is_train=False, aug=AugConfig(H=90, W=160), grid=GridConfig(),
        data_root=fixture_root,
    )
    assert len(val) == 3


def test_loader_batches_and_drop_last(fixture_root):
    nusc = NuScenesIndex("v1.0-mini", fixture_root)
    ds = NuA2DDataset(
        nusc, is_train=True, aug=AugConfig(H=90, W=160), grid=GridConfig(),
        data_root=fixture_root, rng=np.random.default_rng(0),
    )
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 1  # 6 samples, bs 4, drop_last
    b = batches[0]
    assert b["imgs"].shape == (4, 6, 128, 352, 3)
    assert b["binimg"].shape == (4, 200, 200)
    # epoch 2 reshuffles
    b2 = next(iter(dl))
    assert b2["imgs"].shape == (4, 6, 128, 352, 3)


def test_eval_aug_is_deterministic(fixture_root):
    nusc = NuScenesIndex("v1.0-mini", fixture_root)
    aug = AugConfig(H=90, W=160)
    ds = NuA2DDataset(nusc, is_train=False, aug=aug, grid=GridConfig(), data_root=fixture_root)
    a, b = ds[0], ds[0]
    np.testing.assert_array_equal(a["imgs"], b["imgs"])
    np.testing.assert_array_equal(a["post_rots"], b["post_rots"])


def test_train_aug_seeded_reproducible(fixture_root):
    from lss2_multimodal_nu_tpu.data.nuscenes_index import NuScenesIndex

    nusc = NuScenesIndex("v1.0-mini", fixture_root)
    kw = dict(is_train=True, aug=AugConfig(H=90, W=160, rand_flip=True),
              grid=GridConfig(), data_root=fixture_root)
    a = NuA2DDataset(nusc, rng=np.random.default_rng(5), **kw)
    b = NuA2DDataset(nusc, rng=np.random.default_rng(5), **kw)
    np.testing.assert_array_equal(a[0]["imgs"], b[0]["imgs"])
    # different epoch -> different augmentation
    b.set_epoch(1)
    assert not np.array_equal(a[0]["post_rots"], b[0]["post_rots"]) or not np.array_equal(
        a[0]["post_trans"], b[0]["post_trans"]
    )


def test_process_pool_loader_matches_thread_loader(fixture_root):
    """worker_type='process' (the reference's nworkers-processes model,
    data.py:291-299) must produce identical batches to the thread pool on
    the deterministic fixture."""
    nusc = NuScenesIndex("v1.0-mini", fixture_root)

    def make(worker_type):
        ds = NuA2DDataset(
            nusc, is_train=False, aug=AugConfig(H=90, W=160), grid=GridConfig(),
            data_root=fixture_root,
        )
        return DataLoader(
            ds, 2, shuffle=True, drop_last=True, num_workers=2, seed=7,
            worker_type=worker_type,
        )

    a = list(make("thread"))
    b = list(make("process"))
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_process_pool_loader_reproducible_across_runs(fixture_root):
    """Two fresh process-pool loaders with the same seed must yield
    identical batches. The pre-r5 worker init seeded numpy from os.getpid(),
    which broke the reference's deterministic `13 + worker_id` semantics
    (data.py:273-274; VERDICT r4 weak-6)."""
    def run():
        nusc = NuScenesIndex("v1.0-mini", fixture_root)
        ds = NuA2DDataset(
            nusc, is_train=True,
            aug=AugConfig(H=90, W=160, rand_flip=True), grid=GridConfig(),
            data_root=fixture_root, rng=np.random.default_rng(3),
        )
        dl = DataLoader(
            ds, 2, shuffle=True, drop_last=True, num_workers=2, seed=13,
            worker_type="process",
        )
        return list(dl)

    a, b = run(), run()
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_process_worker_init_seeds_by_ordinal():
    """The pool initializer derives its numpy seed from the shared ordinal
    counter (13 + worker_id), not the PID."""
    from lss2_multimodal_nu_tpu.data import loader as loader_mod

    class _Ctr:
        def __init__(self):
            self.value = 0

        def get_lock(self):
            import contextlib

            return contextlib.nullcontext()

    ctr = _Ctr()
    seen = []
    for _ in range(3):
        loader_mod._worker_init(None, 13, ctr)
        seen.append(np.random.randint(0, 2**31))
    # re-running with a fresh counter reproduces the same stream per ordinal
    ctr2 = _Ctr()
    for i in range(3):
        loader_mod._worker_init(None, 13, ctr2)
        assert np.random.randint(0, 2**31) == seen[i]


class _IndexDS:
    """Minimal dataset for loader index-plumbing tests."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"i": np.asarray([i])}


@pytest.mark.parametrize("host_count", [1, 2, 4])
def test_multihost_index_sharding(host_count):
    """Per-host index shards (loader.py _indices) must be disjoint,
    exhaustive over the shuffled permutation's first per*host_count entries,
    and drawn from the SAME seeded permutation on every host — the property
    a multi-host run needs so no sample is read twice or skipped
    (VERDICT r3 item 8)."""
    n = 64
    loaders = [
        DataLoader(
            _IndexDS(n), batch_size=4, shuffle=True, num_workers=1, seed=13,
            host_shard=(h, host_count),
        )
        for h in range(host_count)
    ]
    shards = [np.asarray(ld._indices()) for ld in loaders]
    per = n // host_count
    assert all(len(s) == per for s in shards)
    union = np.concatenate(shards)
    # disjoint + exhaustive: together the shards are exactly 0..n-1 once
    assert len(np.unique(union)) == n
    # shuffle-stable: every host slices ONE common permutation, so the
    # concatenation in host order IS that permutation
    rng = np.random.default_rng(13 + 0)
    perm = np.arange(n)
    rng.shuffle(perm)
    np.testing.assert_array_equal(union, perm)
    # next epoch re-shuffles consistently across hosts
    for ld in loaders:
        list(ld)  # advance epoch
    shards2 = [np.asarray(ld._indices()) for ld in loaders]
    assert len(np.unique(np.concatenate(shards2))) == n
    assert not all(np.array_equal(a, b) for a, b in zip(shards, shards2))


def test_multihost_sharding_truncates_remainder():
    """n not divisible by host_count: every host gets the same count
    (floor(n/hosts)); the remainder is dropped, never duplicated."""
    n, hosts = 103, 4
    shards = [
        np.asarray(
            DataLoader(
                _IndexDS(n), batch_size=4, shuffle=True, num_workers=1,
                seed=3, host_shard=(h, hosts),
            )._indices()
        )
        for h in range(hosts)
    ]
    assert all(len(s) == n // hosts for s in shards)
    union = np.concatenate(shards)
    assert len(np.unique(union)) == len(union)  # disjoint, no duplicates
