"""Parity against the ACTUAL reference tools.py (losses, QuickCumsum voxel
pooling, ConfusionMatrix, gen_dx_bx).

The reference's heavy imports (torchvision, nuscenes, pyquaternion,
efficientnet_pytorch) are absent here, so they are stubbed just enough for
``import tools`` to succeed; every function under test is pure torch. The
hard-coded ``.cuda()`` calls (tools.py:225,235-236 — dropped in the rebuild
per SURVEY Appendix B) are neutralized by patching ``torch.Tensor.cuda`` /
``torch.nn.Module.cuda`` to identity.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _Passthrough:
    def __init__(self, *a, **k):
        pass

    def __call__(self, x):
        return x


_tv = _stub("torchvision")
_tv.transforms = _stub(
    "torchvision.transforms",
    Normalize=_Passthrough,
    Compose=_Passthrough,
    ToTensor=_Passthrough,
    ToPILImage=_Passthrough,
)
_stub("pyquaternion", Quaternion=object)
_nu = _stub("nuscenes")
_stub("nuscenes.utils")
_stub("nuscenes.utils.data_classes", LidarPointCloud=object)
_stub("nuscenes.utils.geometry_utils", transform_matrix=lambda *a, **k: None)
_stub("nuscenes.map_expansion")
_stub("nuscenes.map_expansion.map_api", NuScenesMap=object)

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

sys.path.insert(0, "/root/reference/src")
import tools as ref_tools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lss2_multimodal_nu_tpu.core.grid import gen_dx_bx  # noqa: E402
from lss2_multimodal_nu_tpu.ops.lift_splat import splat  # noqa: E402
from lss2_multimodal_nu_tpu.train.losses import (  # noqa: E402
    multi_loss,
    multi_loss_nobev,
    simple_loss,
)
from lss2_multimodal_nu_tpu.train.metrics import (  # noqa: E402
    confusion_matrix_compute,
    confusion_matrix_update,
)


def test_gen_dx_bx_matches_reference():
    xb, yb, zb = (-50.0, 50.0, 0.5), (-50.0, 50.0, 0.5), (-10.0, 10.0, 20.0)
    dx_t, bx_t, nx_t = ref_tools.gen_dx_bx(xb, yb, zb)
    dx, bx, nx = gen_dx_bx(xb, yb, zb)
    np.testing.assert_allclose(dx, dx_t.numpy())
    np.testing.assert_allclose(bx, bx_t.numpy())
    np.testing.assert_array_equal(nx, nx_t.numpy())


def _reference_voxel_pool(x_t, coords_t, nx, use_quickcumsum):
    """model_baseline.py:84-126 with pre-quantized integer coords
    (Nprime, 4) = (ix, iy, iz, ib) and features (Nprime, C)."""
    B = int(coords_t[:, 3].max().item()) + 1
    kept = (
        (coords_t[:, 0] >= 0) & (coords_t[:, 0] < nx[0])
        & (coords_t[:, 1] >= 0) & (coords_t[:, 1] < nx[1])
        & (coords_t[:, 2] >= 0) & (coords_t[:, 2] < nx[2])
    )
    x_t, coords_t = x_t[kept], coords_t[kept]
    ranks = (
        coords_t[:, 0] * (nx[1] * nx[2] * B)
        + coords_t[:, 1] * (nx[2] * B)
        + coords_t[:, 2] * B
        + coords_t[:, 3]
    )
    sorts = ranks.argsort()
    x_t, coords_t, ranks = x_t[sorts], coords_t[sorts], ranks[sorts]
    if use_quickcumsum:
        x_t, coords_t = ref_tools.QuickCumsum.apply(x_t, coords_t, ranks)
    else:
        x_t, coords_t = ref_tools.cumsum_trick(x_t, coords_t, ranks)
    C = x_t.shape[1]
    final = torch.zeros((B, C, nx[2], nx[0], nx[1]), dtype=x_t.dtype)
    final[coords_t[:, 3], :, coords_t[:, 2], coords_t[:, 0], coords_t[:, 1]] = x_t
    return torch.cat(final.unbind(dim=2), 1)  # (B, Z*C, X, Y)


def _pool_inputs(seed=0, B=2, P=500, C=8, nx=(6, 5, 2)):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, P, C)).astype(np.float32)
    # ~15% out-of-bounds points to exercise the masking path
    coords = rng.integers(-1, np.array(nx) + 1, size=(B, P, 3)).astype(np.int32)
    return x, coords, np.array(nx)


@pytest.mark.parametrize("use_quickcumsum", [True, False])
def test_splat_matches_reference_voxel_pool(use_quickcumsum):
    x, coords, nx = _pool_inputs()
    B, P, C = x.shape
    ib = np.broadcast_to(np.arange(B)[:, None], (B, P)).astype(np.int32)
    coords4 = np.concatenate([coords, ib[..., None]], -1).reshape(B * P, 4)
    ref = _reference_voxel_pool(
        torch.from_numpy(x.reshape(B * P, C)),
        torch.from_numpy(coords4.astype(np.int64)),
        nx,
        use_quickcumsum,
    ).numpy()  # (B, Z*C, X, Y)

    valid = np.all((coords >= 0) & (coords < nx), axis=-1)
    ours = splat(
        jnp.asarray(x), jnp.asarray(coords), jnp.asarray(valid), nx
    )  # (B, X, Y, Z*C)
    ours_nchw = np.moveaxis(np.asarray(ours), 3, 1)
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-5, atol=1e-5)


def test_splat_gradient_matches_quickcumsum_backward():
    """The hand-written QuickCumsum backward (tools.py:210-218) vs the VJP of
    our masked segment-sum splat."""
    x, coords, nx = _pool_inputs(seed=3, B=1, P=200, C=4, nx=(4, 4, 1))
    B, P, C = x.shape
    ib = np.zeros((B, P, 1), np.int32)
    coords4 = np.concatenate([coords, ib], -1).reshape(B * P, 4)
    rng = np.random.default_rng(9)
    gw = rng.normal(size=(B, nx[2] * C, nx[0], nx[1])).astype(np.float32)

    xt = torch.from_numpy(x.reshape(B * P, C)).requires_grad_(True)
    out_t = _reference_voxel_pool(
        xt, torch.from_numpy(coords4.astype(np.int64)), nx, True
    )
    out_t.backward(torch.from_numpy(gw))
    g_ref = xt.grad.numpy().reshape(B, P, C)

    valid = np.all((coords >= 0) & (coords < nx), axis=-1)

    def f(xj):
        out = splat(xj, jnp.asarray(coords), jnp.asarray(valid), nx)
        return jnp.sum(out * jnp.asarray(np.moveaxis(gw, 1, 3)))

    g_ours = np.asarray(jax.grad(f)(jnp.asarray(x)))
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-5, atol=1e-5)


def _rand_multitask(seed=0, B=4, n=4, X=10, Y=10):
    rng = np.random.default_rng(seed)
    bev = rng.normal(size=(B, n, X, Y)).astype(np.float32)
    gt = rng.integers(0, n, size=(B, X, Y))
    act = rng.normal(size=(B, 4)).astype(np.float32)
    act_t = rng.integers(0, 2, size=(B, 4)).astype(np.float32)
    desc = rng.normal(size=(B, 8)).astype(np.float32)
    desc_t = rng.integers(0, 2, size=(B, 8)).astype(np.float32)
    return bev, gt, act, act_t, desc, desc_t


def test_simple_loss_matches_reference():
    bev, gt, *_ = _rand_multitask()
    ref = ref_tools.SimpleLoss()(
        torch.from_numpy(bev), torch.from_numpy(gt)
    ).item()
    ours = float(
        simple_loss(jnp.asarray(np.moveaxis(bev, 1, 3)), jnp.asarray(gt))
    )
    assert abs(ours - ref) < 1e-5


def test_multi_loss_matches_reference():
    bev, gt, act, act_t, desc, desc_t = _rand_multitask(1)
    args = types.SimpleNamespace(gpuid=0)
    ref = ref_tools.MultiLoss(
        torch.from_numpy(bev), torch.from_numpy(act), torch.from_numpy(desc),
        torch.from_numpy(gt), torch.from_numpy(act_t), torch.from_numpy(desc_t),
        args,
    ).item()
    ours = float(
        multi_loss(
            jnp.asarray(np.moveaxis(bev, 1, 3)), jnp.asarray(act),
            jnp.asarray(desc), jnp.asarray(gt), jnp.asarray(act_t),
            jnp.asarray(desc_t),
        )
    )
    assert abs(ours - ref) < 1e-5


def test_multi_loss_nobev_matches_reference():
    _, _, act, act_t, desc, desc_t = _rand_multitask(2)
    args = types.SimpleNamespace(gpuid=0)
    ref = ref_tools.MultiLoss_nobev(
        torch.from_numpy(act), torch.from_numpy(desc), None,
        torch.from_numpy(act_t), torch.from_numpy(desc_t), args,
    ).item()
    ours = float(
        multi_loss_nobev(
            jnp.asarray(act), jnp.asarray(desc), jnp.asarray(act_t),
            jnp.asarray(desc_t),
        )
    )
    assert abs(ours - ref) < 1e-6 * max(abs(ref), 1.0)


def test_confusion_matrix_matches_reference():
    rng = np.random.default_rng(5)
    n = 4
    gt = rng.integers(0, n, size=(3, 50, 50))
    pred = rng.integers(0, n, size=(3, 50, 50))
    cm_ref = ref_tools.ConfusionMatrix(n)
    cm_ref.update(torch.from_numpy(gt).flatten(), torch.from_numpy(pred).flatten())
    acc_g, acc, iu = cm_ref.compute()

    cm = confusion_matrix_update(
        jnp.zeros((n, n), jnp.int32), jnp.asarray(gt), jnp.asarray(pred), n
    )
    res = confusion_matrix_compute(np.asarray(cm))
    np.testing.assert_array_equal(np.asarray(cm), cm_ref.mat.numpy())
    assert abs(float(res["acc_global"]) - acc_g.item()) < 1e-6
    np.testing.assert_allclose(res["iou"], iu.numpy(), rtol=1e-6)
    np.testing.assert_allclose(res["acc"], acc.numpy(), rtol=1e-6)
