"""Block-level A/B of our Flax MBConv against a hand-built torch block with
efficientnet_pytorch's exact semantics (round-2 VERDICT item 7b — de-risks
the EfficientNet-B4 porter before real weights ever arrive; the package
itself is absent here, so its published semantics are reproduced verbatim):

  * TF-style static SAME padding for the depthwise conv: total pad =
    max((ceil(in/s)-1)*s + k - in, 0), LESS on the left/top
    (efficientnet_pytorch utils.Conv2dStaticSamePadding);
  * swish activations; BN eps 1e-3, momentum 0.01 (torch convention);
  * squeeze-excitation with channels = max(1, int(in_ch * se_ratio)) of the
    *input* channels, biased 1x1 convs, swish between, sigmoid gate;
  * projection conv with NO activation;
  * identity skip iff stride == 1 and in_ch == out_ch
    (efficientnet_pytorch model.MBConvBlock.forward).

Weights are ported through the same Porter rules `add_efficientnet_trunk`
uses per block, so this also locks the porter's key layout.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from lss2_multimodal_nu_tpu.nn.efficientnet import MBConv  # noqa: E402
from lss2_multimodal_nu_tpu.port.torch_port import Porter  # noqa: E402


class TorchMBConv(torch.nn.Module):
    """efficientnet_pytorch.model.MBConvBlock semantics, minimal rebuild.

    `static_pad=(lo, hi)` reproduces Conv2dStaticSamePadding (padding fixed
    at construction from the tracked image_size); None = dynamic TF-SAME
    computed from the runtime input (identical for the even sizes these
    block tests use)."""

    def __init__(self, in_ch, out_ch, expand, k, s, static_pad=None):
        super().__init__()
        self.in_ch, self.out_ch, self.expand, self.k, self.s = (
            in_ch, out_ch, expand, k, s,
        )
        self.static_pad = static_pad
        mid = in_ch * expand
        bn = lambda c: torch.nn.BatchNorm2d(c, momentum=0.01, eps=1e-3)  # noqa: E731
        if expand != 1:
            self._expand_conv = torch.nn.Conv2d(in_ch, mid, 1, bias=False)
            self._bn0 = bn(mid)
        self._depthwise_conv = torch.nn.Conv2d(
            mid, mid, k, stride=s, groups=mid, bias=False
        )
        self._bn1 = bn(mid)
        se = max(1, int(in_ch * 0.25))
        self._se_reduce = torch.nn.Conv2d(mid, se, 1)
        self._se_expand = torch.nn.Conv2d(se, mid, 1)
        self._project_conv = torch.nn.Conv2d(mid, out_ch, 1, bias=False)
        self._bn2 = bn(out_ch)

    @staticmethod
    def _same_pad(x, k, s):
        ih, iw = x.shape[-2:]
        ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
        pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
        return torch.nn.functional.pad(
            x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2]
        )

    def forward(self, x):
        swish = torch.nn.functional.silu
        inp = x
        if self.expand != 1:
            x = swish(self._bn0(self._expand_conv(x)))
        if self.static_pad is not None:
            lo, hi = self.static_pad
            x = torch.nn.functional.pad(x, [lo, hi, lo, hi])
        else:
            x = self._same_pad(x, self.k, self.s)
        x = self._depthwise_conv(x)
        x = swish(self._bn1(x))
        s = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        s = self._se_expand(swish(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self.s == 1 and self.in_ch == self.out_ch:
            x = x + inp  # drop_connect is identity in eval mode
        return x


def _randomize_bn(model, seed):
    rng = np.random.default_rng(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            n = m.num_features
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32)))
                m.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32)))


# configs spanning: no-expand stem block, expand-6 with stride 2 (asymmetric
# SAME pad on ODD input sizes), k=5, and the identity-skip case — the b0/b4
# stage shapes the reference Encoder walks (modules.py:48-55)
CASES = [
    # (in_ch, out_ch, expand, k, s, H, W)
    (32, 16, 1, 3, 1, 16, 22),
    (16, 24, 6, 3, 2, 17, 23),   # odd size + stride 2: pad (0,1) sides
    (24, 40, 6, 5, 2, 16, 44),
    (80, 80, 6, 5, 1, 8, 22),    # identity skip active
]


@pytest.mark.parametrize("case", CASES)
def test_mbconv_matches_efficientnet_pytorch_semantics(case):
    in_ch, out_ch, expand, k, s, H, W = case
    torch.manual_seed(hash(case) % (2**31))
    tm = TorchMBConv(in_ch, out_ch, expand, k, s).eval()
    _randomize_bn(tm, seed=in_ch + k)

    x = np.random.default_rng(s + k).normal(size=(2, in_ch, H, W)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    p = Porter()
    if expand != 1:
        p.conv_bn("expand", "_expand_conv", "_bn0")
    p.conv("depthwise/conv", "_depthwise_conv", depthwise=True)
    p.bn("depthwise/bn", "_bn1")
    p.conv("se_reduce", "_se_reduce", bias=True)
    p.conv("se_expand", "_se_expand", bias=True)
    p.conv_bn("project", "_project_conv", "_bn2")
    sd = {kk: v.detach().numpy() for kk, v in tm.state_dict().items()}
    params, bstats, missing = p.run(sd)
    assert not missing, missing

    m = MBConv(in_ch, out_ch, expand, k, s)
    out = m.apply(
        {"params": params, "batch_stats": bstats},
        jnp.asarray(np.moveaxis(x, 1, 3)),
        train=False,
    )
    out = np.moveaxis(np.asarray(out), 3, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert float(np.abs(ref).max()) > 1e-3
