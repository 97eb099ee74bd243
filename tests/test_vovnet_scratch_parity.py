"""Output parity of VoVNetSimple against the reference's ACTUAL from-scratch
backbone (src/vovnet_backbone.py:77-302 — pure torch, importable as-is).

Round-2 VERDICT item 2: `VoVNetSimple` was only shape-tested; this ports real
reference weights through the new `add_vovnet_scratch` mapping and asserts
c3/c4 equality. vovnet39 covers the single-block stages; vovnet57 exercises
the identity-residual blocks (stage3/4 have 2 blocks, identity=(i>0),
vovnet_backbone.py:174-182).
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/src")
import vovnet_backbone as ref_vb  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lss2_multimodal_nu_tpu.nn.vovnet import VoVNetSimple  # noqa: E402
from lss2_multimodal_nu_tpu.port.torch_port import Porter, add_vovnet_scratch  # noqa: E402


def _randomize_bn(model, seed=3):
    rng = np.random.default_rng(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            n = m.num_features
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32)))
                m.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32)))


@pytest.mark.parametrize("model_name", ["vovnet39", "vovnet57"])
def test_vovnet_scratch_matches_reference(model_name):
    torch.manual_seed(17)
    rm = ref_vb.VoVNetV2(model_name=model_name, pretrained=False).eval()
    _randomize_bn(rm)

    x = np.random.default_rng(5).normal(size=(2, 3, 64, 176)).astype(np.float32)
    with torch.no_grad():
        ref = rm(torch.from_numpy(x))
    ref_c3, ref_c4 = ref["c3"].numpy(), ref["c4"].numpy()

    p = Porter()
    add_vovnet_scratch(p, "", "", model_name=model_name)
    sd = {k: v.detach().numpy() for k, v in rm.state_dict().items()}
    params, bstats, missing = p.run(sd)
    assert not missing, missing
    # every torch param was consumed (no silently unmapped weights)
    mapped = {tkey for _, tkey, _ in p.rules}
    unmapped = [k for k in sd if k not in mapped and "num_batches" not in k]
    assert not unmapped, unmapped

    model = VoVNetSimple(model_name=model_name)
    out = model.apply(
        {"params": params, "batch_stats": bstats},
        jnp.asarray(np.moveaxis(x, 1, 3)),
        train=False,
    )
    our_c3 = np.moveaxis(np.asarray(out["c3"]), 3, 1)
    our_c4 = np.moveaxis(np.asarray(out["c4"]), 3, 1)
    assert our_c3.shape == ref_c3.shape and our_c4.shape == ref_c4.shape
    # vovnet39 holds 1e-4; vovnet57's extra stage3/4 blocks accumulate a bit
    # more f32 reduction-order noise (measured max |diff| 4e-4 on ~16-scale
    # activations at c4)
    atol = 1e-4 if model_name == "vovnet39" else 1e-3
    np.testing.assert_allclose(our_c3, ref_c3, atol=atol)
    np.testing.assert_allclose(our_c4, ref_c4, atol=atol)
    # non-degenerate: the eSE gate and residuals actually did something
    assert float(np.abs(ref_c4).max()) > 1e-3
