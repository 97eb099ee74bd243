"""Full-trunk A/B of the Flax EfficientNet against a hand-built torch trunk
with efficientnet_pytorch's exact semantics (VERDICT r3 item 6 — extends the
single-block lock in test_mbconv_semantics.py to the whole stem + block walk
+ reduction-endpoint collection the reference Encoder performs,
/root/reference/src/modules.py:41-59).

Key semantics locked here and nowhere else:
  * Conv2dStaticSamePadding: SAME padding computed STATICALLY from the
    construction-time image_size (224 for b0, 380 for b4), tracked through
    the stride schedule — NOT from the runtime input. For b4 the tracked
    size goes 380 -> 190 -> 95 (odd), so the stage-3 stride-2 k=5 depthwise
    pads (2,2) where dynamic TF-SAME at the reference's (128,352) input
    would pad (1,2) — a real numeric divergence this test would catch.
  * The endpoint walk: `reduction_k = prev_x` whenever the spatial size
    drops, plus the final block output as the last endpoint.
  * Porter block indexing across round_repeats (b4's depth 1.8 gives 32
    blocks) through `add_efficientnet_trunk`.

Weights flow through the same porter path the real released checkpoint
would, so this is the last end-to-end check before real weights.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lss2_multimodal_nu_tpu.nn.efficientnet import (  # noqa: E402
    BASE_STAGES,
    IMAGE_SIZE,
    SCALING,
    EfficientNetTrunk,
    encoder_channels,
    round_filters,
    round_repeats,
    static_same_pad,
)
from lss2_multimodal_nu_tpu.port.torch_port import Porter, add_efficientnet_trunk  # noqa: E402

import sys  # noqa: E402

sys.path.insert(0, "tests")
from test_mbconv_semantics import TorchMBConv, _randomize_bn  # noqa: E402


class TorchEffTrunk(torch.nn.Module):
    """efficientnet_pytorch trunk (stem + _blocks) with static SAME padding,
    walked exactly like the reference Encoder.get_eff_depth (modules.py:41-59)."""

    def __init__(self, variant):
        super().__init__()
        width, depth = SCALING[variant]
        size = IMAGE_SIZE[variant]
        stem_ch = round_filters(32, width)
        (lo, hi), size = static_same_pad(size, 3, 2)
        self._stem_pad = (lo, hi)
        self._conv_stem = torch.nn.Conv2d(3, stem_ch, 3, stride=2, bias=False)
        self._bn0 = torch.nn.BatchNorm2d(stem_ch, momentum=0.01, eps=1e-3)
        blocks = []
        in_ch = stem_ch
        for expand, k, s, c, r in BASE_STAGES:
            out_ch = round_filters(c, width)
            for i in range(round_repeats(r, depth)):
                stride = s if i == 0 else 1
                pad, size = static_same_pad(size, k, stride)
                blocks.append(
                    TorchMBConv(in_ch, out_ch, expand, k, stride, static_pad=pad)
                )
                in_ch = out_ch
        self._blocks = torch.nn.ModuleList(blocks)

    def forward(self, x):
        lo, hi = self._stem_pad
        x = torch.nn.functional.pad(x, [lo, hi, lo, hi])
        x = torch.nn.functional.silu(self._bn0(self._conv_stem(x)))
        endpoints = {}
        prev = x
        for block in self._blocks:  # drop_connect inactive in eval
            x = block(x)
            if prev.size(2) > x.size(2):
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            prev = x
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        return endpoints


class _Holder(torch.nn.Module):
    def __init__(self, trunk):
        super().__init__()
        self.trunk = trunk


@pytest.mark.parametrize(
    "variant,hw",
    [
        ("b0", (64, 176)),
        # b4 at an even runtime size: exercises the odd-tracked-size (95)
        # static pads that DIFFER from dynamic SAME — the fidelity corner
        ("b4", (64, 96)),
    ],
)
def test_efficientnet_trunk_endpoint_parity(variant, hw):
    torch.manual_seed(0)
    tm = _Holder(TorchEffTrunk(variant)).eval()
    _randomize_bn(tm, seed=7)

    h, w = hw
    x = np.random.default_rng(1).normal(size=(2, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        ref = {k: v.numpy() for k, v in tm.trunk(torch.from_numpy(x)).items()}

    p = Porter()
    add_efficientnet_trunk(p, "trunk", "trunk", variant)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, bstats, missing = p.run(sd)
    assert not missing, missing[:5]
    # every torch tensor was consumed by some rule (no silent porter gaps);
    # BN bookkeeping counters have no Flax counterpart
    real_keys = [k for k in sd if not k.endswith("num_batches_tracked")]
    assert len(real_keys) == len(p.rules)

    m = EfficientNetTrunk(variant=variant)
    out = m.apply(
        {"params": params["trunk"], "batch_stats": bstats["trunk"]},
        jnp.asarray(np.moveaxis(x, 1, 3)),
        train=False,
    )
    assert set(out) == set(ref) == {f"reduction_{i}" for i in range(1, 6)}
    r5, r4 = encoder_channels(variant)
    assert out["reduction_5"].shape[-1] == r5
    assert out["reduction_4"].shape[-1] == r4
    for k in sorted(ref):
        ours = np.moveaxis(np.asarray(out[k]), 3, 1)
        assert ours.shape == ref[k].shape, k
        np.testing.assert_allclose(ours, ref[k], atol=2e-4, rtol=1e-4, err_msg=k)
        assert float(np.abs(ref[k]).max()) > 1e-3


def test_b4_static_pad_differs_from_dynamic_same():
    """Guard the IMAGE_SIZE tracking itself: b4's stage-3 stride-2 conv sees
    tracked size 95 (odd) -> pad (2,2); dynamic SAME at the even runtime
    sizes the reference uses would pad (1,2)."""
    size = IMAGE_SIZE["b4"]
    for k, s in ((3, 2), (3, 2), (5, 2)):  # stem, stage2 first, stage3 first
        pad, size = static_same_pad(size, k, s)
    assert pad == (2, 2)
    # dynamic TF-SAME at the reference's runtime size for that layer (32x88)
    dyn, _ = static_same_pad(32, 5, 2)
    assert dyn == (1, 2)
