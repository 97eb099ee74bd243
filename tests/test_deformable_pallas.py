"""Pallas deformable-sampling kernel vs the XLA patch/xla oracles.

On CPU (the CI mesh) the kernel runs in the Pallas interpreter; on a real
TPU backend the same tests exercise the compiled Mosaic kernel. Gradient
equality checks the custom_vjp wiring (backward = patch-path VJP)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lss2_multimodal_nu_tpu.ops import deformable_pallas as dp
from lss2_multimodal_nu_tpu.ops.deformable_sampling import (
    deformable_sample_combine_patch,
    deformable_sample_combine_xla,
)

BH, DH, H, W, NPTS = 4, 32, 16, 16, 4
N = H * W


@pytest.fixture(autouse=True)
def _interpret_on_cpu():
    old = dp._INTERPRET
    dp._INTERPRET = jax.default_backend() == "cpu"
    yield
    dp._INTERPRET = old


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.normal(size=(BH, DH, N)).astype(np.float32))
    locs = jnp.asarray(rng.uniform(0, 1, size=(BH, NPTS, N, 2)).astype(np.float32))
    attn = jnp.asarray(rng.uniform(0, 1, size=(BH, NPTS, N)).astype(np.float32))
    return v, locs, attn


@pytest.mark.parametrize("hw", [(16, 16), (12, 12), (16, 12)])
def test_assembly_paths_match_oracle(hw):
    """Both table-assembly variants against the patch oracle: (16,16)
    takes select-compose (w%8==0, pw%8==0), (12,12)/(16,12) take the
    RMW fallback (w%8!=0). Boundary samples included (locs in [0,1] hit
    the ax=0 / ax=w / y=0 / y=h table edges)."""
    h, w = hw
    n = h * w
    rng = np.random.default_rng(11)
    v = jnp.asarray(rng.normal(size=(BH, DH, n)).astype(np.float32))
    locs = jnp.asarray(rng.uniform(0, 1, size=(BH, NPTS, n, 2)).astype(np.float32))
    # force exact-edge samples into the batch
    locs = locs.at[:, 0, :4, 0].set(jnp.asarray([0.0, 1.0, 0.0, 1.0]))
    locs = locs.at[:, 0, :4, 1].set(jnp.asarray([0.0, 0.0, 1.0, 1.0]))
    attn = jnp.asarray(rng.uniform(0, 1, size=(BH, NPTS, n)).astype(np.float32))
    out = jax.jit(
        lambda a, b, c: dp.deformable_sample_combine_pallas(a, b, c, h, w)
    )(v, locs, attn)
    ref = deformable_sample_combine_patch(v, locs, attn, h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_patch_oracle():
    v, locs, attn = _inputs()
    out = jax.jit(
        lambda a, b, c: dp.deformable_sample_combine_pallas(a, b, c, H, W)
    )(v, locs, attn)
    ref = deformable_sample_combine_patch(v, locs, attn, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_xla_oracle_boundary_locs():
    v, locs, attn = _inputs(1)
    # exercise the clamped boundary (anchors at the zero-padding ring)
    locs = jnp.clip(locs * 1.2 - 0.1, 0.0, 1.0)
    out = jax.jit(
        lambda a, b, c: dp.deformable_sample_combine_pallas(a, b, c, H, W)
    )(v, locs, attn)
    ref = deformable_sample_combine_xla(v, locs, attn, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_nonmultiple_query_count_pads():
    v, locs, attn = _inputs(2)
    n = N - 3  # not a multiple of the 8-query group
    locs, attn = locs[:, :, :n], attn[:, :, :n]
    out = jax.jit(
        lambda a, b, c: dp.deformable_sample_combine_pallas(a, b, c, H, W)
    )(v, locs, attn)
    ref = deformable_sample_combine_patch(v, locs, attn, H, W)
    assert out.shape == (BH, n, DH)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _smooth_inputs(seed=0):
    """Raster locations + sub-pixel offsets: adjacent queries sample
    adjacent pixels, so 8-query groups hit the coalesced fast path."""
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.normal(size=(BH, DH, N)).astype(np.float32))
    ys, xs = np.meshgrid(
        np.linspace(0, 1, H, dtype=np.float32),
        np.linspace(0, 1, W, dtype=np.float32),
        indexing="ij",
    )
    ref = np.stack([xs, ys], axis=-1).reshape(1, 1, N, 2)
    off = rng.uniform(-0.3, 0.3, size=(BH, NPTS, 1, 2)).astype(np.float32) / W
    locs = jnp.asarray(np.clip(ref + off, 0.0, 1.0))
    attn = jnp.asarray(rng.uniform(0, 1, size=(BH, NPTS, N)).astype(np.float32))
    return v, jnp.broadcast_to(locs, (BH, NPTS, N, 2)), attn


@pytest.fixture()
def _coalesce_on():
    """_COALESCE defaults OFF (measured slower on v5e — see the flag's
    A/B block); these tests force it on to keep the fast path's SEMANTICS
    covered in the interpreter."""
    old = dp._COALESCE
    dp._COALESCE = True
    yield
    dp._COALESCE = old


def test_coalesced_consecutive_groups_exact(_coalesce_on):
    """Smooth sampling fields take the run-length-coalesced fast path
    (one (8,128) load per group); result must be bit-identical in
    semantics to the dispersed slow path / patch oracle."""
    v, locs, attn = _smooth_inputs(7)
    out = jax.jit(
        lambda a, b, c: dp.deformable_sample_combine_pallas(a, b, c, H, W)
    )(v, locs, attn)
    ref = deformable_sample_combine_patch(v, locs, attn, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_coalesced_gradients_match_patch_path(_coalesce_on):
    v, locs, attn = _smooth_inputs(8)
    lx, ly = locs[..., 0], locs[..., 1]

    def f_pallas(v, lx, ly, attn):
        o = dp.deformable_sample_combine_pallas_xy(v, lx, ly, attn, H, W)
        return jnp.sum(o * o)

    def f_patch(v, lx, ly, attn):
        from lss2_multimodal_nu_tpu.ops.deformable_sampling import (
            deformable_sample_combine_patch_xy,
        )

        o = deformable_sample_combine_patch_xy(v, lx, ly, attn, H, W)
        return jnp.sum(o * o)

    gp = jax.jit(jax.grad(f_pallas, argnums=(0, 1, 2, 3)))(v, lx, ly, attn)
    go = jax.jit(jax.grad(f_patch, argnums=(0, 1, 2, 3)))(v, lx, ly, attn)
    for a, b in zip(gp, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )


def test_gradients_match_patch_path():
    v, locs, attn = _inputs(3)

    def loss_pallas(v, locs, attn):
        return jnp.sum(
            dp.deformable_sample_combine_pallas(v, locs, attn, H, W) ** 2
        )

    def loss_patch(v, locs, attn):
        return jnp.sum(deformable_sample_combine_patch(v, locs, attn, H, W) ** 2)

    g1 = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(v, locs, attn)
    g2 = jax.jit(jax.grad(loss_patch, argnums=(0, 1, 2)))(v, locs, attn)
    # fwd outputs differ by ~1e-6 fp reassociation; the squared loss doubles
    # that into the cotangent — a wiring bug would be O(1), not O(1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )


def test_bf16_values_forward():
    """bf16 value maps cross HBM in bf16 (channel-major tab_T) but the
    kernel accumulates in f32; output dtype follows the values."""
    v, locs, attn = _inputs(6)
    out16 = jax.jit(
        lambda a, b, c: dp.deformable_sample_combine_pallas(a, b, c, H, W)
    )(v.astype(jnp.bfloat16), locs, attn)
    ref = deformable_sample_combine_patch(v, locs, attn, H, W)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, dtype=np.float32), np.asarray(ref), rtol=3e-2, atol=3e-2
    )


def test_backward_kernel_matches_xla_backward():
    """_bwd_pallas (gtab-RMW kernel + rc-based dattn/dlx/dly) vs the XLA
    patch-path VJP on the same residuals, quadrant-replicated cotangent,
    non-multiple query count (exercises the n_pad path)."""
    v, locs, attn = _inputs(4)
    n = N - 3
    lx, ly = locs[..., 0][:, :, :n], locs[..., 1][:, :, :n]
    attn = attn[:, :, :n]
    rng = np.random.default_rng(5)
    gq = jnp.asarray(rng.normal(size=(BH, n, DH)).astype(np.float32))
    g = jnp.tile(gq, (1, 1, 4))  # quadrant-replicated, per the contract
    res = (v, lx, ly, attn)
    out1 = jax.jit(lambda r, c: dp._bwd_pallas(H, W, r, c))(res, g)
    out2 = jax.jit(lambda r, c: dp._bwd_xla(H, W, r, c))(res, g)
    for name, a, b in zip(("dv", "dlx", "dly", "dattn"), out1, out2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


@pytest.fixture()
def _hbm_table():
    """_TABLE_BUILD defaults to "kernel" (no HBM patch table); force the
    "hbm" fallback (channel-major table shipped through HBM, transposed
    in-kernel) so its semantics stay covered."""
    old = dp._TABLE_BUILD
    dp._TABLE_BUILD = "hbm"
    yield
    dp._TABLE_BUILD = old


def test_hbm_table_mode_forward(_hbm_table):
    v, locs, attn = _inputs(9)
    out = jax.jit(
        lambda a, b, c: dp.deformable_sample_combine_pallas(a, b, c, H, W)
    )(v, locs, attn)
    ref = deformable_sample_combine_patch(v, locs, attn, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_hbm_table_mode_backward(_hbm_table):
    """hbm-mode backward emits the row-major gradient table and folds dv in
    XLA (`_bwd_pallas`'s `_TABLE_BUILD != "kernel"` branch) — check all four
    cotangents against the XLA patch-path VJP, non-multiple query count."""
    v, locs, attn = _inputs(10)
    n = N - 5
    lx, ly = locs[..., 0][:, :, :n], locs[..., 1][:, :, :n]
    attn = attn[:, :, :n]
    rng = np.random.default_rng(11)
    gq = jnp.asarray(rng.normal(size=(BH, n, DH)).astype(np.float32))
    g = jnp.tile(gq, (1, 1, 4))  # quadrant-replicated, per the contract
    res = (v, lx, ly, attn)
    out1 = jax.jit(lambda r, c: dp._bwd_pallas(H, W, r, c))(res, g)
    out2 = jax.jit(lambda r, c: dp._bwd_xla(H, W, r, c))(res, g)
    for name, a, b in zip(("dv", "dlx", "dly", "dattn"), out1, out2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_supports_gate():
    assert dp.supports(32)
    assert not dp.supports(64)


def test_module_grads_pallas_vs_patch():
    """Grad contract through the full module: the prefold custom_vjp assumes
    a quadrant-replicated cotangent, which FoldingDense guarantees."""
    from lss2_multimodal_nu_tpu.nn.transformer import DeformableAttention
    from lss2_multimodal_nu_tpu.ops import deformable_sampling as ds

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, N, 64)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(0, 1, size=(N, 2)).astype(np.float32))
    # dh = 64/4 = 16 -> unsupported by the kernel; use 128-dim instead
    xc = jnp.asarray(rng.normal(size=(2, N, 128)).astype(np.float32))
    mod = DeformableAttention(128, 4, 4)  # dh=32 -> kernel-supported
    variables = mod.init(jax.random.PRNGKey(0), xc, xc, ref)

    def loss(params, impl):
        ds.set_default_impl(impl)
        try:
            out = mod.apply({"params": params}, xc, xc, ref)
        finally:
            ds.set_default_impl(None)
        return jnp.sum(out**2)

    g1 = jax.grad(lambda p: loss(p, "pallas"))(variables["params"])
    g2 = jax.grad(lambda p: loss(p, "patch"))(variables["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )
