"""Fused seg-head kernel vs the XLA ConvBN path (interpreter on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lss2_multimodal_nu_tpu.nn.fusion import BEVEncoderTransformer
from lss2_multimodal_nu_tpu.ops import seg_head_pallas as sp


@pytest.fixture(autouse=True)
def _interpret_on_cpu():
    old_i, old_e = sp._INTERPRET, sp._ENABLED
    sp._INTERPRET = jax.default_backend() == "cpu"
    yield
    sp._INTERPRET, sp._ENABLED = old_i, old_e


def _rand_params(rng, h, w, cin=256, mid1=128, mid2=64, out=4):
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    x = f(2, h * w, cin) * 0.5
    w0 = f(3, 3, cin, mid1) * 0.05
    b0 = f(mid1)
    w1 = f(3, 3, mid1, mid2) * 0.05
    b1 = f(mid2)
    w2 = f(mid2, out) * 0.1
    b2 = f(out)
    return x, w0, b0, w1, b1, w2, b2


def _oracle(x, w0, b0, w1, b1, w2, b2, h, w):
    """Plain-XLA SAME convs on the folded weights."""
    b = x.shape[0]
    img = x.reshape(b, h, w, -1)
    y = jax.lax.conv_general_dilated(
        img, w0, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b0
    y = jnp.maximum(y, 0.0)
    y = jax.lax.conv_general_dilated(
        y, w1, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1
    y = jnp.maximum(y, 0.0)
    return jnp.einsum("bhwc,co->bhwo", y, w2) + b2


def test_fused_matches_conv_oracle_f32():
    """Kernel math (f32, interpreter) vs XLA SAME convs, incl. borders."""
    rng = np.random.default_rng(0)
    h = w = 24
    x, w0, b0, w1, b1, w2, b2 = _rand_params(rng, h, w)
    out = jax.jit(
        lambda *a: sp.fused_seg_head(*a, h, w)
    )(x, w0, b0, w1, b1, w2, b2)
    ref = _oracle(x, w0, b0, w1, b1, w2, b2, h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_matches_conv_oracle_bf16():
    """bf16 activations (the deployed path) against the f32 oracle at bf16
    tolerance — same contract the XLA bf16 modules satisfy."""
    rng = np.random.default_rng(1)
    h = w = 16
    x, w0, b0, w1, b1, w2, b2 = _rand_params(rng, h, w)
    out = jax.jit(
        lambda *a: sp.fused_seg_head(a[0].astype(jnp.bfloat16), *a[1:], h, w)
    )(x, w0, b0, w1, b1, w2, b2)
    ref = _oracle(x, w0, b0, w1, b1, w2, b2, h, w)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 0.05 * scale


def test_bev_encoder_fused_vs_xla_path():
    """Module-level: bf16 eval forward with the fused seg head vs the XLA
    modules — identical param tree, output within bf16 tolerance."""
    rng = np.random.default_rng(2)
    h = w = 16
    mod = BEVEncoderTransformer(out_features=4, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, h, w, 128)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    v = mod.init(jax.random.PRNGKey(0), x, False)

    # force support() shapes: (16,16) grid is supported; run fused then XLA
    seg_f, ref_f = mod.apply(v, x, False)
    sp._ENABLED = False
    seg_x, ref_x = mod.apply(v, x, False)

    assert seg_f.dtype == seg_x.dtype and seg_f.shape == seg_x.shape
    np.testing.assert_array_equal(np.asarray(ref_f), np.asarray(ref_x))
    d = float(jnp.max(jnp.abs(seg_f.astype(jnp.float32) - seg_x.astype(jnp.float32))))
    s = float(jnp.max(jnp.abs(seg_x.astype(jnp.float32)))) or 1.0
    assert d < 0.08 * s, (d, s)


def test_param_tree_identical_between_paths():
    """The fused branch must materialize exactly the XLA branch's params."""
    mod = BEVEncoderTransformer(out_features=4, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, 16, 128), jnp.bfloat16)
    v_fused = mod.init(jax.random.PRNGKey(0), x, False)
    sp._ENABLED = False
    v_xla = mod.init(jax.random.PRNGKey(0), x, False)
    t1 = jax.tree.structure(v_fused)
    t2 = jax.tree.structure(v_xla)
    assert t1 == t2
    for a, b in zip(jax.tree.leaves(v_fused), jax.tree.leaves(v_xla)):
        assert a.shape == b.shape and a.dtype == b.dtype
