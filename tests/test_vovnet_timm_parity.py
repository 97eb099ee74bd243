"""Full-trunk A/B of the Flax `VoVNetV2` (the flagship's backbone) against a
hand-built torch trunk with timm `ese_vovnet` layout and semantics, ported
through `add_vovnet_timm` — the porter path real timm checkpoints flow
through (`cli.py port`, reference vovnet_timm.py:48-53), which until now was
never executed by any test (round-3 VERDICT §2.3 note).

Locked here (timm vovnet.py semantics, reproduced verbatim since the
package is absent in this environment):
  * stem: three ConvBnAct 3x3 (strides 2,1,2 — overall stride 4),
    torch-symmetric padding 1, BN eps 1e-5 / momentum 0.1, ReLU;
  * OsaStage: stages 2-4 open with MaxPool2d(3, stride=2, ceil_mode=True);
  * OsaBlock: 5 mid ConvBnAct at conv_chs width, one-shot concat of
    [input, 5 outs], 1x1 ConvBnAct to out_chs, EffectiveSEModule
    (mean-pool -> biased 1x1 conv -> hardsigmoid gate), identity residual
    on every block but the first of a stage;
  * state-dict naming: `stem.{i}.conv/bn`, `stages.{s}.blocks.{b}
    .conv_mid.{i}.conv/bn`, `.conv_concat.conv/bn`, `.attn.fc`;
  * features_only(out_indices=(3,4)): c3 = stage-3 output @ stride 16,
    c4 = stage-4 output @ stride 32.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from lss2_multimodal_nu_tpu.nn.vovnet import TIMM_CONFIGS, VoVNetV2  # noqa: E402
from lss2_multimodal_nu_tpu.port.torch_port import Porter, add_vovnet_timm  # noqa: E402

import sys  # noqa: E402

sys.path.insert(0, "tests")
from test_mbconv_semantics import _randomize_bn  # noqa: E402


class ConvBnAct(torch.nn.Module):
    def __init__(self, cin, cout, k=3, s=1):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, stride=s, padding=k // 2,
                                    bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.nn.functional.relu(self.bn(self.conv(x)))


class OsaBlock(torch.nn.Module):
    def __init__(self, cin, mid, cout, layers, residual):
        super().__init__()
        self.residual = residual
        chans = cin
        mids = []
        for _ in range(layers):
            mids.append(ConvBnAct(chans, mid, 3))
            chans = mid
        self.conv_mid = torch.nn.ModuleList(mids)
        self.conv_concat = ConvBnAct(cin + layers * mid, cout, 1)
        self.attn = torch.nn.Module()
        self.attn.fc = torch.nn.Conv2d(cout, cout, 1, bias=True)

    def forward(self, x):
        identity = x
        outs = [x]
        for m in self.conv_mid:
            x = m(x)
            outs.append(x)
        x = self.conv_concat(torch.cat(outs, dim=1))
        s = x.mean((2, 3), keepdim=True)
        x = x * torch.nn.functional.hardsigmoid(self.attn.fc(s))
        if self.residual and identity.shape[1] == x.shape[1]:
            x = x + identity
        return x


class OsaStage(torch.nn.Module):
    def __init__(self, blocks, pool):
        super().__init__()
        self.pool = pool
        self.blocks = torch.nn.ModuleList(blocks)

    def forward(self, x):
        if self.pool:
            x = torch.nn.functional.max_pool2d(x, 3, stride=2, ceil_mode=True)
        for b in self.blocks:
            x = b(x)
        return x


class TorchTimmVoVNet(torch.nn.Module):
    def __init__(self, model_name):
        super().__init__()
        stem_chs, conv_chs, out_chs, layers, blocks = TIMM_CONFIGS[model_name]
        stem = []
        cin = 3
        for ch, s in zip(stem_chs, (2, 1, 2)):
            stem.append(ConvBnAct(cin, ch, 3, s))
            cin = ch
        self.stem = torch.nn.ModuleList(stem)
        stages = []
        for s in range(4):
            blist = [
                OsaBlock(cin if b == 0 else out_chs[s], conv_chs[s],
                         out_chs[s], layers, residual=b > 0)
                for b in range(blocks[s])
            ]
            stages.append(OsaStage(blist, pool=s > 0))
            cin = out_chs[s]
        self.stages = torch.nn.ModuleList(stages)

    def forward(self, x):
        for m in self.stem:
            x = m(x)
        feats = {}
        for s, stage in enumerate(self.stages):
            x = stage(x)
            if s == 2:
                feats["c3"] = x
        feats["c4"] = x
        return feats


class _Holder(torch.nn.Module):
    def __init__(self, bb):
        super().__init__()
        self.bb = bb


@pytest.mark.parametrize("model_name", ["vovnet39", "vovnet57"])
def test_vovnet_timm_trunk_parity(model_name):
    torch.manual_seed(3)
    tm = _Holder(TorchTimmVoVNet(model_name)).eval()
    _randomize_bn(tm, seed=11)

    x = np.random.default_rng(2).normal(size=(2, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = {k: v.numpy() for k, v in tm.bb(torch.from_numpy(x)).items()}
    assert ref["c3"].shape == (2, 768, 4, 6)
    assert ref["c4"].shape == (2, 1024, 2, 3)

    p = Porter()
    add_vovnet_timm(p, "bb", "bb", model_name)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, bstats, missing = p.run(sd)
    assert not missing, missing[:5]
    real_keys = [k for k in sd if not k.endswith("num_batches_tracked")]
    assert len(real_keys) == len(p.rules)

    m = VoVNetV2(model_name=model_name)
    out = m.apply(
        {"params": params["bb"], "batch_stats": bstats["bb"]},
        jnp.asarray(np.moveaxis(x, 1, 3)),
        train=False,
    )
    for k in ("c3", "c4"):
        ours = np.moveaxis(np.asarray(out[k]), 3, 1)
        assert ours.shape == ref[k].shape, k
        np.testing.assert_allclose(ours, ref[k], atol=2e-4, rtol=1e-4, err_msg=k)
        assert float(np.abs(ref[k]).max()) > 1e-3
