"""Output parity against the ACTUAL reference stack-B modules
(src/model_vovnet_transformer.py, src/modules.py) — everything downstream of
the timm backbone is pure torch and runs here with stubbed heavy imports
(the backbone itself needs timm weights; its porter mapping is covered by
structural tests in test_port.py)."""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _stub(name, **attrs):
    if name in sys.modules:
        m = sys.modules[name]
    else:
        m = types.ModuleType(name)
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


class _Passthrough:
    def __init__(self, *a, **k):
        pass

    def __call__(self, x):
        return x


_tv = _stub("torchvision")
_tv.transforms = _stub(
    "torchvision.transforms",
    Normalize=_Passthrough, Compose=_Passthrough,
    ToTensor=_Passthrough, ToPILImage=_Passthrough,
)
_tv.models = _stub("torchvision.models")
_stub("torchvision.models.resnet", resnet18=lambda *a, **k: None)
_stub("efficientnet_pytorch", EfficientNet=object)
_stub("pyquaternion", Quaternion=object)
_stub("nuscenes")
_stub("nuscenes.utils")
_stub("nuscenes.utils.data_classes", LidarPointCloud=object)
_stub("nuscenes.utils.geometry_utils", transform_matrix=lambda *a, **k: None)
_stub("nuscenes.map_expansion")
_stub("nuscenes.map_expansion.map_api", NuScenesMap=object)

sys.path.insert(0, "/root/reference/src")
import model_vovnet_transformer as ref_mv  # noqa: E402
import modules as ref_modules  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lss2_multimodal_nu_tpu.nn import fusion as F  # noqa: E402
from lss2_multimodal_nu_tpu.nn import lss_modules as L  # noqa: E402
from lss2_multimodal_nu_tpu.nn.depth_net import (  # noqa: E402
    CamEncodeV2,
    MultiScaleDepthNet,
)
from lss2_multimodal_nu_tpu.ops.lift_splat import lift  # noqa: E402
from lss2_multimodal_nu_tpu.port.torch_port import (  # noqa: E402
    Porter,
    add_bev_transformer,
    add_bevpost,
    add_convbnrelu_seq,
    add_depth_head,
    add_sceneunder,
)

B = 2


def sd(m, prefix="m."):
    return {prefix + k: v.detach().numpy() for k, v in m.state_dict().items()}


def nchw(x):
    return np.moveaxis(np.asarray(x), 3, 1)


def rand_nchw(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def run_port(p, m):
    params, bstats, missing = p.run(sd(m))
    assert not missing, missing
    out = {"params": params["m"]}
    if bstats and bstats.get("m"):
        out["batch_stats"] = bstats["m"]
    return out


def test_multiscale_depthnet_matches_reference():
    torch.manual_seed(0)
    rm = ref_mv.MultiScaleDepthNet(96, 128, 11).eval()
    c3 = rand_nchw((B, 96, 8, 22), 1)
    c4 = rand_nchw((B, 128, 4, 11), 2)
    with torch.no_grad():
        ref = rm(torch.from_numpy(c3), torch.from_numpy(c4)).numpy()
    p = Porter()
    add_depth_head(p, "m/depth_c3", "m.depth_c3")
    add_depth_head(p, "m/depth_c4", "m.depth_c4")
    p.conv("m/fusion/conv", "m.fusion.0", bias=True)
    p.bn("m/fusion/bn", "m.fusion.1")
    fm = MultiScaleDepthNet(depth_bins=11)
    out = fm.apply(
        run_port(p, rm),
        jnp.asarray(np.moveaxis(c3, 1, 3)),
        jnp.asarray(np.moveaxis(c4, 1, 3)),
    )
    np.testing.assert_allclose(nchw(out), ref, atol=1e-5)


def test_camencode_v2_lift_matches_reference():
    torch.manual_seed(1)
    rm = ref_mv.CamEncodeV2(11, 96, 32).eval()
    feat = rand_nchw((B, 96, 8, 22), 3)
    depth = np.random.default_rng(4).dirichlet(
        np.ones(11), size=(B, 8, 22)
    ).astype(np.float32)
    depth_t = torch.from_numpy(np.moveaxis(depth, 3, 1))
    with torch.no_grad():
        ref = rm(torch.from_numpy(feat), depth_t).numpy()  # (B, C, D, H, W)
    p = Porter()
    p.conv("m/feat_proj", "m.feat_proj", bias=True)
    fm = CamEncodeV2(out_features=32)
    proj = fm.apply(run_port(p, rm), jnp.asarray(np.moveaxis(feat, 1, 3)))
    vol = lift(proj, jnp.asarray(np.moveaxis(depth, 3, 1)))  # (B, D, H, W, C)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(vol), 4, 1), ref, atol=1e-5
    )


def test_adaptive_feature_pyramid_matches_reference():
    torch.manual_seed(2)
    rm = ref_mv.AdaptiveFeaturePyramid(96, 64).eval()
    x = rand_nchw((B, 96, 8, 22), 5)
    with torch.no_grad():
        ref = rm(torch.from_numpy(x)).numpy()
    p = Porter()
    add_convbnrelu_seq(p, "m/scale1", "m.scale1")
    add_convbnrelu_seq(p, "m/scale2", "m.scale2")
    add_convbnrelu_seq(p, "m/fusion", "m.fusion")
    fm = F.AdaptiveFeaturePyramid(out_features=64)
    out = fm.apply(run_port(p, rm), jnp.asarray(np.moveaxis(x, 1, 3)))
    np.testing.assert_allclose(nchw(out), ref, atol=1e-5)


def test_camera_transformer_matches_reference():
    torch.manual_seed(3)
    rm = ref_mv.LightweightCameraTransformer(64, 4, 0.1, 6).eval()
    x = np.random.default_rng(6).normal(size=(B, 6, 64)).astype(np.float32)
    ids = torch.arange(6).unsqueeze(0).expand(B, 6)
    with torch.no_grad():
        ref = rm(torch.from_numpy(x), ids).numpy()
    p = Porter()
    p.copy("m/cam_embed/embedding", "m.cam_embed.weight")
    p.mha("m/self_attn", "m.self_attn")
    p.layernorm("m/norm1", "m.norm1")
    p.layernorm("m/norm2", "m.norm2")
    p.linear("m/ffn0", "m.ffn.0")
    p.linear("m/ffn1", "m.ffn.3")
    fm = F.LightweightCameraTransformer(d_model=64, n_heads=4)
    out = fm.apply(
        run_port(p, rm), jnp.asarray(x), jnp.arange(6)[None].repeat(B, 0)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_bev_camera_fusion_matches_reference():
    torch.manual_seed(4)
    rm = ref_mv.BEVCameraFusion(64, 64, 4).eval()
    cam = np.random.default_rng(7).normal(size=(B, 6, 64)).astype(np.float32)
    bev = rand_nchw((B, 64, 10, 10), 8)
    with torch.no_grad():
        ref = rm(torch.from_numpy(cam), torch.from_numpy(bev)).numpy()
    p = Porter()
    p.mha("m/cross_attn", "m.cross_attn")
    p.layernorm("m/norm", "m.norm")
    fm = F.BEVCameraFusion(d_model=64, n_heads=4)
    out = fm.apply(
        run_port(p, rm), jnp.asarray(cam), jnp.asarray(np.moveaxis(bev, 1, 3))
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_unified_predictor_matches_reference():
    torch.manual_seed(5)
    rm = ref_mv.UnifiedPredictor(64, 4, 8, 6).eval()
    with torch.no_grad():
        rm.camera_weights.uniform_(0.0, 1.0)  # break the constant init
    cam = np.random.default_rng(9).normal(size=(B, 6, 64)).astype(np.float32)
    with torch.no_grad():
        ra, rd = rm(torch.from_numpy(cam))
    p = Porter()
    p.copy("m/camera_weights", "m.camera_weights")
    p.linear("m/enc0", "m.encoder.0")
    p.layernorm("m/enc_norm0", "m.encoder.1")
    p.linear("m/enc1", "m.encoder.4")
    p.layernorm("m/enc_norm1", "m.encoder.5")
    p.linear("m/action_head", "m.action_head")
    p.linear("m/desc_head", "m.desc_head")
    fm = F.UnifiedPredictor()
    # our module reads features sized by input; d_model=64 here
    a, d = fm.apply(run_port(p, rm), jnp.asarray(cam))
    np.testing.assert_allclose(np.asarray(a), ra.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d), rd.numpy(), atol=1e-4)


def test_bev_encoder_transformer_matches_reference():
    """The composite: compress -> deformable transformer -> seg head
    (reference :125-173) — exercises the full deformable path end-to-end."""
    torch.manual_seed(6)
    rm = ref_mv.BEVEncoderTransformer(32, 4).eval()
    with torch.no_grad():  # break the structured zero-inits
        rm.transformer.encoder.self_attn.sampling_offsets.weight.uniform_(-0.05, 0.05)
        rm.transformer.encoder.self_attn.attention_weights.weight.uniform_(-0.1, 0.1)
    x = rand_nchw((B, 32, 16, 16), 10)
    with torch.no_grad():
        seg_r, ref_r = (t.numpy() for t in rm(torch.from_numpy(x)))
    p = Porter()
    add_convbnrelu_seq(p, "m/compress", "m.compress")
    add_bev_transformer(p, "m/transformer", "m.transformer")
    p.conv("m/seg0/conv", "m.seg_head.0", bias=True)
    p.bn("m/seg0/bn", "m.seg_head.1")
    p.conv("m/seg1/conv", "m.seg_head.3", bias=True)
    p.bn("m/seg1/bn", "m.seg_head.4")
    p.conv("m/seg_out", "m.seg_head.6", bias=True)
    fm = F.BEVEncoderTransformer(out_features=4)
    seg, refined = fm.apply(
        run_port(p, rm), jnp.asarray(np.moveaxis(x, 1, 3))
    )
    np.testing.assert_allclose(nchw(refined), ref_r, atol=5e-4)
    np.testing.assert_allclose(nchw(seg), seg_r, atol=5e-4)


def test_sceneunder_matches_reference():
    torch.manual_seed(7)
    rm = ref_modules.SceneUnder(48).eval()
    x = rand_nchw((B, 48, 8, 22), 11)
    with torch.no_grad():
        ref = rm(torch.from_numpy(x)).numpy()
    p = Porter()
    add_sceneunder(p, "m", "m")
    fm = L.SceneUnder()
    out = fm.apply(run_port(p, rm), jnp.asarray(np.moveaxis(x, 1, 3)))
    np.testing.assert_allclose(nchw(out), ref, atol=1e-5)


def test_bevpost_matches_reference():
    torch.manual_seed(8)
    rm = ref_modules.BevPost(4, 8).eval()
    x = rand_nchw((B, 4, 80, 88), 12)
    with torch.no_grad():
        ref = rm(torch.from_numpy(x)).numpy()
    p = Porter()
    add_bevpost(p, "m", "m")
    fm = L.BevPost()
    out = fm.apply(run_port(p, rm), jnp.asarray(np.moveaxis(x, 1, 3)))
    np.testing.assert_allclose(nchw(out), ref, atol=1e-5)
