"""Fused lift+splat Pallas kernel vs the XLA segment-sum path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lss2_multimodal_nu_tpu.ops import lift_splat as ls
from lss2_multimodal_nu_tpu.ops import lift_splat_pallas as lsp


@pytest.fixture(autouse=True)
def _interpret_on_cpu():
    old = lsp._INTERPRET
    lsp._INTERPRET = jax.default_backend() == "cpu"
    yield
    lsp._INTERPRET = old


def _inputs(seed=0, B=2, N=3, D=5, fH=4, fW=6, C=16, nxy=16):
    rng = np.random.default_rng(seed)
    nx = np.array([nxy, nxy, 1])
    feat = jnp.asarray(rng.normal(size=(B, N, fH, fW, C)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0, 1, size=(B, N, D, fH, fW)).astype(np.float32)
    )
    idx = jnp.asarray(
        rng.integers(0, nxy, size=(B, N, D, fH, fW, 3)).astype(np.int32)
    )
    idx = idx.at[..., 2].set(0)
    valid = jnp.asarray(rng.uniform(size=(B, N, D, fH, fW)) > 0.3)
    return feat, depth, idx, valid, nx


def test_fused_matches_xla_forward():
    feat, depth, idx, valid, nx = _inputs()
    fused = ls.lift_splat(feat, depth, idx, valid, nx)
    ls._IMPL = "xla"
    try:
        ref = ls.lift_splat(feat, depth, idx, valid, nx)
    finally:
        ls._IMPL = "auto"
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_fused_grads_match_xla():
    feat, depth, idx, valid, nx = _inputs(seed=1)

    def loss(impl, f, d):
        ls._IMPL = impl
        try:
            out = ls.lift_splat(f, d, idx, valid, nx)
        finally:
            ls._IMPL = "auto"
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gf_fused = jax.grad(lambda f, d: loss("auto", f, d), argnums=(0, 1))(feat, depth)
    gf_xla = jax.grad(lambda f, d: loss("xla", f, d), argnums=(0, 1))(feat, depth)
    for a, b in zip(gf_fused, gf_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_point_padding_and_collisions():
    """Non-multiple point count + all points in one voxel (heavy collisions)."""
    B, N, D, fH, fW, C, nxy = 1, 1, 3, 3, 3, 8, 8
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.normal(size=(B, N, fH, fW, C)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0.5, 1, size=(B, N, D, fH, fW)).astype(np.float32)
    )
    idx = jnp.full((B, N, D, fH, fW, 3), 3, dtype=jnp.int32)
    idx = idx.at[..., 2].set(0)
    valid = jnp.ones((B, N, D, fH, fW), dtype=bool)
    nx = np.array([nxy, nxy, 1])
    fused = ls.lift_splat(feat, depth, idx, valid, nx)
    ls._IMPL = "xla"
    try:
        ref = ls.lift_splat(feat, depth, idx, valid, nx)
    finally:
        ls._IMPL = "auto"
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)
    # every contribution landed in voxel (3, 3)
    assert float(jnp.sum(jnp.abs(fused))) > 0
    mask = np.zeros((nxy, nxy), bool)
    mask[3, 3] = True
    np.testing.assert_array_equal(
        np.asarray(jnp.any(jnp.abs(fused[0]) > 0, axis=-1)), mask
    )
