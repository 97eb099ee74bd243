"""FULL-MODEL output parity against the ACTUAL reference flagship
(src/model_vovnet_transformer.py::VoVNetBEVTransformer, built via its own
`compile_model_vovnet_transformer` factory).

timm is absent here, so the trunk is a 2-conv stub injected through a stubbed
`timm.create_model` on the torch side and a matching Flax module monkeypatched
into our model on this side (VERDICT round-1 item 3: "vendor a random-weight
reference model by stubbing the backbone import and parity-check everything
downstream of the trunk"). Everything else — geometry, frustum, lift,
QuickCumsum voxel pooling, deformable transformer, seg head, feature pyramid,
SceneUnder, camera attention, BEV fusion, unified predictor — is the
reference's own torch code vs our full Flax model, weight-ported end-to-end.

The real-backbone porter mapping is covered structurally in test_port.py and
cannot be output-checked without timm weights (no network egress here).
"""
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


class _FakeTimmFeatures(torch.nn.Module):
    """Stands in for timm ese_vovnet features_only: [c3 (768, /16), c4 (1024, /32)]."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(42)
        self.conv1 = torch.nn.Conv2d(3, 768, 16, stride=16)
        self.conv2 = torch.nn.Conv2d(768, 1024, 2, stride=2)

    def forward(self, x):
        c3 = self.conv1(x)
        return [c3, self.conv2(c3)]


_stub("timm", create_model=lambda *a, **k: _FakeTimmFeatures())

sys.path.insert(0, "/root/reference/src")
import model_vovnet_transformer as ref_mv  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as fnn  # noqa: E402

from lss2_multimodal_nu_tpu.config import (  # noqa: E402
    AugConfig,
    Config,
    GridConfig,
    ModelConfig,
)
from lss2_multimodal_nu_tpu.models import vovnet_transformer as our_mv  # noqa: E402
from lss2_multimodal_nu_tpu.port.torch_port import (  # noqa: E402
    Porter,
    add_vovnet_transformer,
)

B, N, H, W = 2, 6, 64, 176


class _FakeVoVNet(fnn.Module):
    """Flax twin of _FakeTimmFeatures (+ the VoVNetV2 wrapper's dict output)."""

    model_name: str = "stub"
    dtype: object = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = False):
        c3 = fnn.Conv(768, (16, 16), strides=(16, 16), padding="VALID",
                      dtype=self.dtype, name="conv1")(x)
        c4 = fnn.Conv(1024, (2, 2), strides=(2, 2), padding="VALID",
                      dtype=self.dtype, name="conv2")(c3)
        return {"c3": c3, "c4": c4}


def _inputs():
    """Well-conditioned camera geometry scaled to the (64,176) test images."""
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(B, N, 3, H, W)).astype(np.float32)
    rots = np.broadcast_to(np.eye(3, dtype=np.float32), (B, N, 3, 3)).copy()
    trans = rng.normal(0, 1, (B, N, 3)).astype(np.float32)
    intr = np.broadcast_to(
        np.array([[1266.0, 0, 800.0], [0, 1266.0, 450.0], [0, 0, 1.0]], np.float32),
        (B, N, 3, 3),
    ).copy()
    post_r = np.broadcast_to(
        np.eye(3, dtype=np.float32) * (W / 1600.0), (B, N, 3, 3)
    ).copy()
    post_r[..., 2, 2] = 1.0
    post_t = np.zeros((B, N, 3), np.float32)
    return imgs, rots, trans, intr, post_r, post_t


def test_flagship_full_model_matches_reference():
    grid_conf = {
        "xbound": [-16.0, 16.0, 0.5],
        "ybound": [-16.0, 16.0, 0.5],
        "zbound": [-10.0, 10.0, 20.0],
        "dbound": [4.0, 45.0, 1.0],
    }
    data_aug_conf = {
        "final_dim": (H, W),
        "Ncams": N,
        "cams": [
            "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
            "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
        ],
    }

    torch.manual_seed(0)
    rm = ref_mv.compile_model_vovnet_transformer(
        B, grid_conf, data_aug_conf, outC=4, vovnet_type="vovnet39",
        pretrained=False, lss_version="v2",
        use_camera_attn=True, use_cross_attn=True,
    ).eval()
    with torch.no_grad():  # break the structured zero-inits so sampling moves
        attn = rm.bev_encoder.transformer.encoder.self_attn
        attn.sampling_offsets.weight.uniform_(-0.05, 0.05)
        attn.attention_weights.weight.uniform_(-0.1, 0.1)
        rm.unified_predictor.camera_weights.uniform_(0.0, 1.0)

    imgs, rots, trans, intr, post_r, post_t = _inputs()
    with torch.no_grad():
        ref_bev, ref_act, ref_desc = (
            t.numpy()
            for t in rm(*map(torch.from_numpy, (imgs, rots, trans, intr, post_r, post_t)))
        )

    cfg = Config(
        grid=GridConfig(xbound=(-16.0, 16.0, 0.5), ybound=(-16.0, 16.0, 0.5)),
        aug=AugConfig(final_dim=(H, W)),
        model=ModelConfig(
            family="vovnet_transformer", vovnet_type="vovnet39", lss_version="v2"
        ),
    )

    p = Porter()
    add_vovnet_transformer(p, backbone=False)
    p.conv("backbone/conv1", "backbone.backbone.conv1", bias=True)
    p.conv("backbone/conv2", "backbone.backbone.conv2", bias=True)
    sd = {k: v.detach().numpy() for k, v in rm.state_dict().items()}
    params, bstats, missing = p.run(sd)
    assert not missing, missing
    variables = {"params": params, "batch_stats": bstats}

    real = our_mv.VoVNetV2
    our_mv.VoVNetV2 = _FakeVoVNet
    try:
        model = our_mv.VoVNetBEVTransformer(cfg=cfg)
        bev, act, desc = model.apply(
            variables,
            jnp.asarray(np.moveaxis(imgs, 2, 4)),
            *map(jnp.asarray, (rots, trans, intr, post_r, post_t)),
        )
    finally:
        our_mv.VoVNetV2 = real

    bev_nchw = np.moveaxis(np.asarray(bev), 3, 1)
    np.testing.assert_allclose(bev_nchw, ref_bev, atol=2e-3)
    np.testing.assert_allclose(np.asarray(act), ref_act, atol=1e-3)
    np.testing.assert_allclose(np.asarray(desc), ref_desc, atol=1e-3)
    # the outputs are non-degenerate (sampling/pooling actually moved data)
    assert float(np.abs(ref_bev).max()) > 1e-3
    assert float(np.std(ref_act)) > 1e-4


# --------------------------------------------------------------------------
# Stack A: full BEV_TXT (model_BEV_TXT.py) with a stubbed EfficientNet trunk.
# --------------------------------------------------------------------------

class _FakeEffBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, 3, stride=stride, padding=1)

    def forward(self, x, drop_connect_rate=None):
        return torch.nn.functional.silu(self.conv(x))


class _FakeEffNet(torch.nn.Module):
    """Duck-types the efficientnet_pytorch surface walked by the reference
    Encoder.get_eff_depth (modules.py:38-61): stem -> blocks with stride-2
    boundaries producing reduction_4 (160ch, /16) and reduction_5 (448ch, /32)
    — the b4 channel counts Up(448+160, 512) expects."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(7)
        self._conv_stem = torch.nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False)
        self._bn0 = torch.nn.BatchNorm2d(32)
        self._blocks = torch.nn.ModuleList(
            [
                _FakeEffBlock(32, 24, 2),    # /4,  saves reduction_1 = stem
                _FakeEffBlock(24, 40, 2),    # /8,  saves reduction_2
                _FakeEffBlock(40, 160, 2),   # /16, saves reduction_3
                _FakeEffBlock(160, 448, 2),  # /32, saves reduction_4 (160, /16)
            ]
        )
        self._global_params = types.SimpleNamespace(drop_connect_rate=0.0)

    @staticmethod
    def _swish(x):
        return torch.nn.functional.silu(x)

    @classmethod
    def from_pretrained(cls, name):
        return cls()


class _TVBasicBlock(torch.nn.Module):
    """torchvision.models.resnet.BasicBlock semantics (eval mode)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class _FakeResnet18(torch.nn.Module):
    """Just the pieces BevEncode borrows (modules.py:98-106)."""

    def __init__(self, **kw):
        super().__init__()
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.layer1 = torch.nn.Sequential(_TVBasicBlock(64, 64), _TVBasicBlock(64, 64))
        self.layer2 = torch.nn.Sequential(_TVBasicBlock(64, 128, 2), _TVBasicBlock(128, 128))
        self.layer3 = torch.nn.Sequential(_TVBasicBlock(128, 256, 2), _TVBasicBlock(256, 256))


def _randomize_bn(model, seed=3):
    """Break the degenerate BN init (weight 1/0, stats 0/1) so ported BN
    params and running stats are actually exercised."""
    rng = np.random.default_rng(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            n = m.num_features
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32)))
                m.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32)))


class _FakeEffTrunkFlax(fnn.Module):
    """Flax twin of _FakeEffNet returning the endpoints our Encoder consumes."""

    variant: str = "b4"
    dtype: object = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = False):
        silu = fnn.silu
        x = fnn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        x = fnn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                          dtype=self.dtype, name="bn0")(x)
        x = silu(x)
        outs = []
        for i, c in enumerate((24, 40, 160, 448)):
            x = silu(
                fnn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name=f"b{i}")(x)
            )
            outs.append(x)
        return {"reduction_4": outs[2], "reduction_5": outs[3]}


def test_bev_txt_full_model_matches_reference():
    sys.path.insert(0, "/root/reference")
    import efficientnet_pytorch

    efficientnet_pytorch.EfficientNet = _FakeEffNet
    sys.modules["torchvision.models.resnet"].resnet18 = lambda **kw: _FakeResnet18(**kw)
    import src.model_BEV_TXT as ref_bt  # package import: relative .tools/.modules
    # the reference module binds these names at import time
    ref_bt.Encoder.__init__.__globals__["EfficientNet"] = _FakeEffNet
    import src.modules as ref_sm

    ref_sm.EfficientNet = _FakeEffNet
    ref_sm.resnet18 = lambda **kw: _FakeResnet18(**kw)

    HH, WW = 128, 352
    grid_conf = {
        "xbound": [-50.0, 50.0, 0.5],
        "ybound": [-50.0, 50.0, 0.5],
        "zbound": [-10.0, 10.0, 20.0],
        "dbound": [4.0, 45.0, 1.0],
    }
    data_aug_conf = {"final_dim": (HH, WW), "Ncams": 6}

    torch.manual_seed(1)
    rm = ref_bt.compile_model_bevtxt(B, grid_conf, data_aug_conf, outC=4).eval()
    _randomize_bn(rm)

    rng = np.random.default_rng(5)
    imgs = rng.normal(size=(B, N, 3, HH, WW)).astype(np.float32)
    _, rots, trans, intr, post_r, post_t = _inputs()
    post_r2 = post_r.copy()
    post_r2[..., 0, 0] = post_r2[..., 1, 1] = WW / 1600.0
    with torch.no_grad():
        ref_bev, ref_act, ref_desc = (
            t.numpy()
            for t in rm(*map(torch.from_numpy, (imgs, rots, trans, intr, post_r2, post_t)))
        )

    from lss2_multimodal_nu_tpu.nn import lss_modules as our_lm
    from lss2_multimodal_nu_tpu.models import bev_txt as our_bt
    from lss2_multimodal_nu_tpu.port.torch_port import add_bev_txt

    p = Porter()
    add_bev_txt(p, variant="b4", trunk=False)
    p.conv("lss/encoder/trunk/conv_stem", "encoder.trunk._conv_stem")
    p.bn("lss/encoder/trunk/bn0", "encoder.trunk._bn0")
    for i in range(4):
        p.conv(f"lss/encoder/trunk/b{i}", f"encoder.trunk._blocks.{i}.conv", bias=True)
    sd = {k: v.detach().numpy() for k, v in rm.state_dict().items()}
    params, bstats, missing = p.run(sd)
    assert not missing, missing
    variables = {"params": params, "batch_stats": bstats}

    cfg = Config(model=ModelConfig(family="bev_txt", effnet_variant="b4"))
    real = our_lm.EfficientNetTrunk
    our_lm.EfficientNetTrunk = _FakeEffTrunkFlax
    try:
        model = our_bt.BevTxt(cfg=cfg)
        bev, act, desc = model.apply(
            variables,
            jnp.asarray(np.moveaxis(imgs, 2, 4)),
            *map(jnp.asarray, (rots, trans, intr, post_r2, post_t)),
        )
    finally:
        our_lm.EfficientNetTrunk = real

    np.testing.assert_allclose(np.moveaxis(np.asarray(bev), 3, 1), ref_bev, atol=2e-3)
    np.testing.assert_allclose(np.asarray(act), ref_act, atol=1e-3)
    np.testing.assert_allclose(np.asarray(desc), ref_desc, atol=1e-3)
    assert float(np.abs(ref_bev).max()) > 1e-3
