"""Fused LN->FFN->LN kernel vs the XLA module path (interpreter on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lss2_multimodal_nu_tpu.ops import ffn_pallas as fp
from lss2_multimodal_nu_tpu.nn.transformer import TransformerEncoderLayer


@pytest.fixture(autouse=True)
def _interpret_on_cpu():
    old_i, old_e = fp._INTERPRET, fp._ENABLED
    fp._INTERPRET = jax.default_backend() == "cpu"
    yield
    fp._INTERPRET, fp._ENABLED = old_i, old_e


def test_fused_matches_reference_math():
    """Kernel vs plain-jnp tail math in f32, non-multiple row count (pads)."""
    rng = np.random.default_rng(0)
    B, N, C, F = 2, 100, 128, 256
    u = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(C, F)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(F,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(F, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    s1 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    o1 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    s2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    o2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    out = jax.jit(
        lambda *a: fp.fused_ffn_ln(*a, compute_dtype=jnp.float32)
    )(u, w1, b1, w2, b2, s1, o1, s2, o2)

    def ln(x, s, o, eps=1e-6):
        mu = jnp.mean(x, -1, keepdims=True)
        d = x - mu
        var = jnp.mean(d * d, -1, keepdims=True)
        return d * jax.lax.rsqrt(var + eps) * s + o

    s = ln(u, s1, o1)
    h = fp._gelu_erf(s @ w1 + b1)
    ref = ln(s + h @ w2 + b2, s2, o2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_encoder_layer_fused_vs_xla_path():
    """Module-level: eval forward with the fused tail == the XLA modules."""
    rng = np.random.default_rng(1)
    B, N, C = 2, 64, 128
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(1, N, C)).astype(np.float32))
    ref_pts = jnp.asarray(rng.uniform(0, 1, size=(N, 2)).astype(np.float32))
    layer = TransformerEncoderLayer(C, 4, 256, 0.0)
    v = layer.init(jax.random.PRNGKey(0), x, pos, ref_pts)

    out_fused = layer.apply(v, x, pos, ref_pts, train=False)
    fp._ENABLED = False
    out_xla = layer.apply(v, x, pos, ref_pts, train=False)
    assert out_fused.shape == out_xla.shape
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), atol=5e-5
    )


def test_param_tree_identical_across_paths():
    """The fused branch must materialize the exact param tree the XLA
    branch creates (porting + checkpoint compatibility)."""
    rng = np.random.default_rng(2)
    B, N, C = 1, 64, 128
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    pos = jnp.zeros((1, N, C), jnp.float32)
    ref_pts = jnp.asarray(rng.uniform(0, 1, size=(N, 2)).astype(np.float32))
    layer = TransformerEncoderLayer(C, 4, 256, 0.0)
    v_fused = layer.init(jax.random.PRNGKey(0), x, pos, ref_pts)
    fp._ENABLED = False
    v_xla = layer.init(jax.random.PRNGKey(0), x, pos, ref_pts)
    t1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v_fused)
    t2 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v_xla)
    assert t1 == t2
    for a, b in zip(jax.tree.leaves(v_fused), jax.tree.leaves(v_xla)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
