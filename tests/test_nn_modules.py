"""Module shape tests mirroring the reference's __main__ smoke tests (SURVEY §4(c))."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss2_multimodal_nu_tpu.nn.efficientnet import (
    EfficientNetTrunk,
    encoder_channels,
    round_filters,
    round_repeats,
)
from lss2_multimodal_nu_tpu.nn.layers import max_pool_ceil
from lss2_multimodal_nu_tpu.nn.lss_modules import (
    ASPP,
    BevEncode,
    BevPost,
    CamEncode,
    Encoder,
    EmbedderFlat,
    SceneUnder,
)

torch = pytest.importorskip("torch")


def test_round_filters_b4_channel_table():
    """Reference comment modules.py:35: b4 -> 448+160."""
    assert round_filters(320, 1.4) == 448
    assert round_filters(112, 1.4) == 160
    assert round_filters(320, 1.0) == 320  # b0
    assert round_filters(112, 1.0) == 112
    assert encoder_channels("b4") == (448, 160)
    assert encoder_channels("b0") == (320, 112)


def test_round_repeats():
    assert round_repeats(2, 1.8) == 4
    assert round_repeats(1, 1.8) == 2
    assert round_repeats(3, 1.0) == 3


def test_efficientnet_endpoints_shapes():
    m = EfficientNetTrunk(variant="b0")
    x = jnp.zeros((2, 128, 352, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    eps = m.apply(vars_, x)
    assert eps["reduction_4"].shape == (2, 8, 22, 112)
    assert eps["reduction_5"].shape == (2, 4, 11, 320)


def test_encoder_output_512():
    m = Encoder(variant="b0")
    x = jnp.zeros((2, 128, 352, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (2, 8, 22, 512)


def test_camencode_depth_softmax():
    m = CamEncode(depth_bins=41, features=64)
    x = jnp.ones((2, 8, 22, 512))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    depth, feat = m.apply(vars_, x)
    assert depth.shape == (2, 8, 22, 41)
    assert feat.shape == (2, 8, 22, 64)
    np.testing.assert_allclose(np.asarray(depth.sum(-1)), 1.0, rtol=1e-5)


def test_bevencode_shapes():
    m = BevEncode(out_features=4)
    x = jnp.zeros((1, 200, 200, 64))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (1, 200, 200, 4)


def test_bevpost_maps_crop_to_cam_dims():
    """(80,88) BEV crop -> (8,22), reference model_BEV_TXT.py:285-287."""
    m = BevPost()
    x = jnp.zeros((1, 80, 88, 4))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (1, 8, 22, 8)


def test_max_pool_ceil_matches_torch():
    rng = np.random.default_rng(0)
    for (h, w), k, s, ceil in [
        ((8, 22), (3, 3), (2, 2), True),
        ((40, 88), (5, 4), (5, 4), False),
        ((9, 13), (3, 3), (2, 2), True),
        ((9, 13), (3, 3), (2, 2), False),
    ]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        got = np.asarray(max_pool_ceil(jnp.asarray(x), k, s, ceil_mode=ceil))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = (
            torch.nn.functional.max_pool2d(xt, k, s, ceil_mode=ceil)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, err_msg=f"{(h,w,k,s,ceil)}")


def test_aspp_output():
    m = SceneUnder()
    x = jnp.zeros((2, 8, 22, 512))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (2, 8, 22, 256)


def test_embedder_flat_matches_torch_flatten_order():
    """Flatten must follow torch's NCHW (C,H,W) order for weight porting."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 22, 40)).astype(np.float32)
    w = rng.normal(size=(40 * 8 * 22, 40)).astype(np.float32) * 0.01
    b = rng.normal(size=(40,)).astype(np.float32)
    m = EmbedderFlat(out_features=40)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    vars_ = {"params": {"fc": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}}
    got = np.asarray(m.apply(vars_, jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    want = (torch.flatten(xt, 1) @ torch.from_numpy(w) + torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("as_list", [False, True])
@pytest.mark.parametrize("use_bias", [False, True])
def test_convbn_inference_fold_matches_unfused(as_list, use_bias):
    """Eval-mode BN folding == explicit conv(+bias) -> BN(running stats), for
    both the array path and the concat-free list path, with and without a
    conv bias (regression: the list path used to add the bias unscaled —
    ADVICE r3 medium)."""
    from lss2_multimodal_nu_tpu.nn.layers import ConvBN

    rng = np.random.default_rng(3)
    cin, cout = 6, 8
    x = rng.normal(size=(2, 5, 7, cin)).astype(np.float32)
    m = ConvBN(cout, (1, 1), act=None, use_bias=use_bias)
    inp = [jnp.asarray(x[..., :2]), jnp.asarray(x[..., 2:])] if as_list else jnp.asarray(x)
    vars_ = m.init(jax.random.PRNGKey(0), inp)
    # non-trivial BN stats/affine so the fold actually has to do work
    vars_ = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(0.2, 0.7, p.shape).astype(np.float32)), vars_
    )
    var = np.abs(rng.normal(1.0, 0.3, (cout,))).astype(np.float32) + 0.1
    vars_["batch_stats"]["bn"]["var"] = jnp.asarray(var)
    folded = np.asarray(m.apply(vars_, inp))  # train=False -> folded path

    # manual unfused reference
    k = np.asarray(vars_["params"]["conv"]["kernel"])[0, 0]  # (cin, cout)
    y = x @ k
    if use_bias:
        y = y + np.asarray(vars_["params"]["conv"]["bias"])
    bnp, bns = vars_["params"]["bn"], vars_["batch_stats"]["bn"]
    g = np.asarray(bnp["scale"]) / np.sqrt(np.asarray(bns["var"]) + 1e-5)
    want = (y - np.asarray(bns["mean"])) * g + np.asarray(bnp["bias"])
    np.testing.assert_allclose(folded, want, rtol=2e-5, atol=2e-5)


def test_conv_padding_matches_torch_stride2():
    """torch Conv2d(7,s2,p3) vs our ConvBN('torch' padding) — alignment check."""
    from lss2_multimodal_nu_tpu.nn.layers import ConvBN

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 20, 20, 3)).astype(np.float32)
    wt = rng.normal(size=(7, 7, 3, 8)).astype(np.float32) * 0.1
    m = ConvBN(8, (7, 7), strides=(2, 2), act=None, use_bn=False)
    vars_ = {"params": {"conv": {"kernel": jnp.asarray(wt)}}}
    got = np.asarray(m.apply(vars_, jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    wt_t = torch.from_numpy(wt).permute(3, 2, 0, 1)  # OIHW
    want = (
        torch.nn.functional.conv2d(xt, wt_t, stride=2, padding=3)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
