"""Golden-value tests for grid/frustum/geometry math (SURVEY §4(a))."""
import numpy as np
import jax.numpy as jnp

from lss2_multimodal_nu_tpu.config import AugConfig, GridConfig
from lss2_multimodal_nu_tpu.core.augment import (
    AugParams,
    accumulate_post_transform,
    expand_to_3x3,
    sample_augmentation,
)
from lss2_multimodal_nu_tpu.core.frustum import create_frustum
from lss2_multimodal_nu_tpu.core.geometry import get_geometry, invert_3x3, voxel_indices
from lss2_multimodal_nu_tpu.core.grid import gen_dx_bx

GRID = GridConfig()


def test_gen_dx_bx_golden():
    dx, bx, nx = gen_dx_bx(GRID.xbound, GRID.ybound, GRID.zbound)
    np.testing.assert_allclose(dx, [0.5, 0.5, 20.0])
    np.testing.assert_allclose(bx, [-49.75, -49.75, 0.0])
    np.testing.assert_array_equal(nx, [200, 200, 1])


def test_grid_config_properties():
    assert GRID.nx == (200, 200, 1)
    assert GRID.num_depth_bins == 41


def test_frustum_shape_and_values():
    fr = create_frustum((128, 352), GRID.dbound, 16)
    assert fr.shape == (41, 8, 22, 3)
    # depth runs 4..44 inclusive
    np.testing.assert_allclose(fr[:, 0, 0, 2], np.arange(4.0, 45.0))
    # pixel extents
    assert fr[0, 0, 0, 0] == 0 and fr[0, 0, -1, 0] == 351
    assert fr[0, 0, 0, 1] == 0 and fr[0, -1, 0, 1] == 127


def test_invert_3x3_matches_numpy():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(4, 6, 3, 3)).astype(np.float32) + np.eye(3, dtype=np.float32)
    got = np.asarray(invert_3x3(jnp.asarray(m)))
    want = np.linalg.inv(m)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _identity_cams(b=2, n=3):
    rots = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3)).copy()
    trans = np.zeros((b, n, 3), dtype=np.float32)
    intr = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3)).copy()
    post_r = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3)).copy()
    post_t = np.zeros((b, n, 3), dtype=np.float32)
    return rots, trans, intr, post_r, post_t


def test_geometry_identity_cameras():
    """With identity intrinsics/extrinsics/aug, geometry = (u*d, v*d, d)."""
    fr = create_frustum((128, 352), GRID.dbound, 16)
    rots, trans, intr, post_r, post_t = _identity_cams()
    pts = np.asarray(
        get_geometry(jnp.asarray(fr), *map(jnp.asarray, (rots, trans, intr, post_r, post_t)))
    )
    assert pts.shape == (2, 3, 41, 8, 22, 3)
    want = np.concatenate([fr[..., :2] * fr[..., 2:3], fr[..., 2:3]], axis=-1)
    np.testing.assert_allclose(pts[0, 0], want, rtol=1e-5, atol=1e-5)


def test_geometry_translation_and_rotation():
    """Translation adds; camera rotation rotates the unprojected rays."""
    fr = create_frustum((128, 352), GRID.dbound, 16)
    rots, trans, intr, post_r, post_t = _identity_cams(1, 1)
    trans[0, 0] = [1.0, -2.0, 3.0]
    # 90-degree rotation about z
    rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    rots[0, 0] = rz
    pts = np.asarray(
        get_geometry(jnp.asarray(fr), *map(jnp.asarray, (rots, trans, intr, post_r, post_t)))
    )
    cam = np.concatenate([fr[..., :2] * fr[..., 2:3], fr[..., 2:3]], axis=-1)
    want = cam @ rz.T + np.array([1.0, -2.0, 3.0], dtype=np.float32)
    np.testing.assert_allclose(pts[0, 0], want, rtol=1e-4, atol=1e-4)


def test_geometry_undoes_post_augmentation():
    """Applying a post affine and passing it as post_rot/post_tran must give the
    same geometry as no augmentation at all (the model un-does it)."""
    fr = create_frustum((128, 352), GRID.dbound, 16)
    rots, trans, intr, post_r, post_t = _identity_cams(1, 1)
    base = np.asarray(
        get_geometry(jnp.asarray(fr), *map(jnp.asarray, (rots, trans, intr, post_r, post_t)))
    )

    params = AugParams(
        resize=0.22, resize_dims=(352, 198), crop=(0, 70, 352, 198), flip=True, rotate=3.0
    )
    pr2, pt2 = accumulate_post_transform(params)
    pr3, pt3 = expand_to_3x3(pr2, pt2)
    # transform the frustum pixels by the affine, then let get_geometry undo it
    fr_aug = fr.copy()
    uv = fr[..., :2]
    fr_aug[..., :2] = uv @ pr2.T + pt2
    got = np.asarray(
        get_geometry(
            jnp.asarray(fr_aug),
            *map(
                jnp.asarray,
                (rots, trans, intr, pr3[None, None], pt3[None, None]),
            ),
        )
    )
    np.testing.assert_allclose(got, base, rtol=1e-3, atol=1e-2)


def test_voxel_indices_truncation_matches_torch_long():
    """torch .long() truncates toward zero: a point at coordinate -0.3 voxels
    maps to 0 (kept), unlike floor (-1, dropped). Preserve that quirk."""
    dx, bx, nx = gen_dx_bx(GRID.xbound, GRID.ybound, GRID.zbound)
    # choose a point slightly *outside* the low edge: geom = bx - dx/2 - 0.1*dx
    geom = np.array(
        [[(bx[0] - dx[0] / 2.0) - 0.05, (bx[1] - dx[1] / 2.0) + 0.2, 0.0]],
        dtype=np.float32,
    )
    idx, valid = voxel_indices(jnp.asarray(geom), dx, bx, nx)
    idx = np.asarray(idx)
    # torch: (-0.05/0.5).long() == 0 -> kept; floor would be -1
    assert idx[0, 0] == 0 and idx[0, 1] == 0 and idx[0, 2] == 0
    assert bool(np.asarray(valid)[0])


def test_voxel_indices_bounds():
    dx, bx, nx = gen_dx_bx(GRID.xbound, GRID.ybound, GRID.zbound)
    geom = np.array(
        [
            [0.0, 0.0, 0.0],  # center -> (99 or 100, ...), valid
            [-49.9, -49.9, -9.9],  # near low corner, valid
            [55.0, 0.0, 0.0],  # x out of bounds
            [0.0, 0.0, 25.0],  # z out of bounds
        ],
        dtype=np.float32,
    )
    idx, valid = voxel_indices(jnp.asarray(geom), dx, bx, nx)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert valid.tolist() == [True, True, False, False]
    assert idx[0, 0] == 100 and idx[0, 2] == 0


def test_sample_augmentation_eval_deterministic():
    aug = AugConfig()
    p = sample_augmentation(aug, is_train=False)
    assert p.resize == max(128 / 900, 352 / 1600)
    assert p.resize_dims == (352, 198)
    assert p.crop == (0, int((1 - 0.11) * 198) - 128, 352, int((1 - 0.11) * 198))
    assert not p.flip and p.rotate == 0.0


def test_sample_augmentation_train_in_range():
    aug = AugConfig(rand_flip=True)
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = sample_augmentation(aug, is_train=True, rng=rng)
        assert aug.resize_lim[0] <= p.resize <= aug.resize_lim[1]
        assert aug.rot_lim[0] <= p.rotate <= aug.rot_lim[1]
        w0, h0, w1, h1 = p.crop
        assert (w1 - w0, h1 - h0) == (352, 128)


def test_ego_cam_roundtrip():
    from lss2_multimodal_nu_tpu.core.geometry import cam_to_ego, ego_to_cam, get_only_in_img_mask

    rng = np.random.default_rng(7)
    intr = np.array([[1266.0, 0, 800.0], [0, 1266.0, 450.0], [0, 0, 1.0]], np.float32)
    rot = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    trans = rng.normal(size=3).astype(np.float32)
    cam_pts = np.stack(
        [rng.uniform(100, 1500, 50), rng.uniform(100, 800, 50), rng.uniform(2, 40, 50)]
    ).astype(np.float32)
    ego = cam_to_ego(jnp.asarray(cam_pts), jnp.asarray(rot), jnp.asarray(trans), jnp.asarray(intr))
    back = ego_to_cam(ego, jnp.asarray(rot), jnp.asarray(trans), jnp.asarray(intr))
    np.testing.assert_allclose(np.asarray(back), cam_pts, rtol=1e-2, atol=2e-2)
    mask = get_only_in_img_mask(back, 900, 1600)
    assert bool(np.asarray(mask).all())
