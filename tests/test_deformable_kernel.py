"""Pallas deformable-sampling kernel vs XLA path vs torch grid_sample oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss2_multimodal_nu_tpu.ops.deformable_sampling import (
    deformable_sample_combine_patch,
    deformable_sample_combine_xla,
)

torch = pytest.importorskip("torch")


def _case(seed=0, bh=4, dh=8, h=8, w=16, npts=3):
    rng = np.random.default_rng(seed)
    n = h * w
    v = rng.normal(size=(bh, dh, n)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(bh, npts, n, 2)).astype(np.float32)
    attn = rng.normal(size=(bh, npts, n)).astype(np.float32)
    return v, locs, attn, h, w


def _torch_oracle(v, locs, attn, h, w):
    bh, dh, n = v.shape
    npts = locs.shape[1]
    vt = torch.from_numpy(v).reshape(bh, dh, h, w)
    grid = torch.from_numpy(locs * 2.0 - 1.0).reshape(bh, npts * n, 1, 2)
    s = torch.nn.functional.grid_sample(
        vt, grid, mode="bilinear", padding_mode="zeros", align_corners=False
    ).squeeze(-1)  # (bh, dh, npts*n)
    s = s.reshape(bh, dh, npts, n)
    a = torch.from_numpy(attn)  # (bh, npts, n)
    return torch.einsum("bdpn,bpn->bnd", s, a).numpy()


def test_xla_path_matches_torch():
    v, locs, attn, h, w = _case()
    got = np.asarray(
        deformable_sample_combine_xla(
            jnp.asarray(v), jnp.asarray(locs), jnp.asarray(attn), h, w
        )
    )
    want = _torch_oracle(v, locs, attn, h, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_patch_matches_torch():
    v, locs, attn, h, w = _case(seed=1)
    # patch path requires locations clamped to [0,1] (as the module does)
    locs = np.clip(locs, 0.0, 1.0)
    got = np.asarray(
        deformable_sample_combine_patch(
            jnp.asarray(v), jnp.asarray(locs), jnp.asarray(attn), h, w
        )
    )
    want = _torch_oracle(v, locs, attn, h, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_patch_matches_xla_chunked():
    """Exercise the chunked XLA path (n > query_chunk) vs the patch path."""
    v, locs, attn, h, w = _case(seed=2, bh=2, dh=4, h=20, w=20, npts=2)
    locs = np.clip(locs, 0.0, 1.0)
    a = deformable_sample_combine_patch(
        jnp.asarray(v), jnp.asarray(locs), jnp.asarray(attn), h, w
    )
    b = deformable_sample_combine_xla(
        jnp.asarray(v), jnp.asarray(locs), jnp.asarray(attn), h, w, query_chunk=100
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_patch_gradients_with_remat():
    """Backward through the rematerialized scan: finite grads that match the
    XLA path's gradients."""
    v, locs, attn, h, w = _case(seed=3, bh=2, dh=4, h=6, w=8, npts=2)
    locs = np.clip(locs, 0.0, 1.0)

    def loss_patch(v_):
        out = deformable_sample_combine_patch(v_, jnp.asarray(locs), jnp.asarray(attn), h, w)
        return jnp.sum(out**2)

    def loss_xla(v_):
        out = deformable_sample_combine_xla(v_, jnp.asarray(locs), jnp.asarray(attn), h, w)
        return jnp.sum(out**2)

    g1 = jax.jit(jax.grad(loss_patch))(jnp.asarray(v))
    g2 = jax.jit(jax.grad(loss_xla))(jnp.asarray(v))
    assert np.isfinite(np.asarray(g1)).all()
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
