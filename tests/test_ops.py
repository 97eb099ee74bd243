"""Kernel tests: lift-splat vs independent numpy oracle (QuickCumsum semantics,
reference src/tools.py:181-218) and resampling vs torch (SURVEY §4(b))."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss2_multimodal_nu_tpu.core.geometry import voxel_indices
from lss2_multimodal_nu_tpu.core.grid import gen_dx_bx
from lss2_multimodal_nu_tpu.ops.lift_splat import lift, lift_splat, splat
from lss2_multimodal_nu_tpu.ops.sampling import grid_sample_bilinear, resize_bilinear

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------- lift-splat
def numpy_voxel_pool_oracle(feats, idx, valid, nx):
    """Independent per-voxel-sum oracle (what the cumsum trick computes)."""
    X, Y, Z = int(nx[0]), int(nx[1]), int(nx[2])
    B, P, C = feats.shape
    out = np.zeros((B, X, Y, Z * C), dtype=np.float64)
    for b in range(B):
        for p in range(P):
            if not valid[b, p]:
                continue
            x, y, z = idx[b, p]
            out[b, x, y, z * C : (z + 1) * C] += feats[b, p]
    return out.astype(np.float32)


def _random_points(seed=0, B=2, P=500, C=8, nx=(12, 10, 2)):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, P, C)).astype(np.float32)
    idx = rng.integers(-2, np.array(nx) + 2, size=(B, P, 3)).astype(np.int32)
    valid = np.all((idx >= 0) & (idx < np.array(nx)), axis=-1)
    return feats, idx, valid, np.array(nx)


def test_splat_matches_oracle():
    feats, idx, valid, nx = _random_points()
    got = np.asarray(splat(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(valid), nx))
    want = numpy_voxel_pool_oracle(feats, idx, valid, nx)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_splat_gradient_is_gather():
    """VJP of per-voxel sum routes each voxel's cotangent to all contributing
    points — identical to QuickCumsum.backward (tools.py:210-218)."""
    feats, idx, valid, nx = _random_points(seed=1, B=1, P=64, C=4, nx=(5, 5, 1))

    def loss(f):
        bev = splat(f, jnp.asarray(idx), jnp.asarray(valid), nx)
        return jnp.sum(bev**2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
    bev = numpy_voxel_pool_oracle(feats, idx, valid, nx)
    want = np.zeros_like(feats)
    for p in range(feats.shape[1]):
        if valid[0, p]:
            x, y, z = idx[0, p]
            want[0, p] = 2.0 * bev[0, x, y, z * 4 : (z + 1) * 4]
    np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)


def test_lift_outer_product():
    rng = np.random.default_rng(2)
    feat = rng.normal(size=(2, 3, 4, 5, 6)).astype(np.float32)  # B,N,h,w,C
    depth = rng.normal(size=(2, 3, 7, 4, 5)).astype(np.float32)  # B,N,D,h,w
    got = np.asarray(lift(jnp.asarray(feat), jnp.asarray(depth)))
    want = depth[..., None] * feat[:, :, None]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("chunked", [False, True])
def test_lift_splat_end_to_end(chunked):
    """Full pipeline on random geometry equals oracle(lift)."""
    rng = np.random.default_rng(3)
    B, N, D, h, w, C = 2, 3, 5, 4, 6, 8
    nx = np.array([16, 16, 1])
    dx, bx, _ = gen_dx_bx((-4, 4, 0.5), (-4, 4, 0.5), (-10, 10, 20))
    feat = rng.normal(size=(B, N, h, w, C)).astype(np.float32)
    depth = rng.normal(size=(B, N, D, h, w)).astype(np.float32)
    geom = rng.uniform(-5, 5, size=(B, N, D, h, w, 3)).astype(np.float32)
    geom[..., 2] = rng.uniform(-9, 9, size=(B, N, D, h, w))
    idx, valid = voxel_indices(jnp.asarray(geom), dx, bx, nx)

    got = np.asarray(
        lift_splat(
            jnp.asarray(feat), jnp.asarray(depth), idx, valid, nx, camera_chunked=chunked
        )
    )
    pts = depth[..., None] * feat[:, :, None]
    want = numpy_voxel_pool_oracle(
        pts.reshape(B, -1, C),
        np.asarray(idx).reshape(B, -1, 3),
        np.asarray(valid).reshape(B, -1),
        nx,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- resize
@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 22), (16, 44)), ((5, 7), (20, 28)), ((4, 11), (8, 22)), ((16, 44), (8, 22)), ((9, 9), (5, 5))],
)
def test_resize_bilinear_matches_torch(align, in_hw, out_hw):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        torch.nn.functional.interpolate(xt, size=out_hw, mode="bilinear", align_corners=align)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- grid_sample
@pytest.mark.parametrize("align", [False, True])
def test_grid_sample_matches_torch(align):
    rng = np.random.default_rng(5)
    B, H, W, C, P = 2, 9, 13, 4, 257
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # include OOB coords to exercise zero padding
    coords = rng.uniform(-1.3, 1.3, size=(B, P, 2)).astype(np.float32)
    got = np.asarray(
        grid_sample_bilinear(jnp.asarray(x), jnp.asarray(coords), align_corners=align)
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    grid = torch.from_numpy(coords).view(B, P, 1, 2)
    want = (
        torch.nn.functional.grid_sample(
            xt, grid, mode="bilinear", padding_mode="zeros", align_corners=align
        )
        .squeeze(-1)
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
