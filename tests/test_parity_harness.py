"""Parity-harness plumbing test: port a synthetic torch state dict, replay a
trace whose outputs came from the ported model itself, expect PASS; corrupt a
weight, expect FAIL."""
import pickle

import numpy as np
import jax
import pytest

from lss2_multimodal_nu_tpu.config import Config, ModelConfig
from lss2_multimodal_nu_tpu.models.factory import build_model
from lss2_multimodal_nu_tpu.port.parity import check_parity
from lss2_multimodal_nu_tpu.port.torch_port import build_porter

import sys

sys.path.insert(0, "tests")
from test_models import fake_batch
from test_port import fake_torch_state


def test_parity_harness_roundtrip(tmp_path):
    family, variant = "lss", "b0"
    cfg = Config(model=ModelConfig(family=family, effnet_variant=variant))
    model = build_model(cfg)
    inputs = fake_batch(b=1)
    vars_ = model.init(jax.random.PRNGKey(0), *inputs)
    porter = build_porter(family, variant=variant)
    sd = fake_torch_state(porter, vars_["params"], vars_["batch_stats"])
    params, bs, _ = porter.run(sd)
    out = model.apply({"params": params, "batch_stats": bs}, *inputs)

    imgs_nchw = np.transpose(np.asarray(inputs[0]), (0, 1, 4, 2, 3))
    trace = {
        "inputs": {
            "imgs": imgs_nchw,
            "rots": np.asarray(inputs[1]),
            "trans": np.asarray(inputs[2]),
            "intrins": np.asarray(inputs[3]),
            "post_rots": np.asarray(inputs[4]),
            "post_trans": np.asarray(inputs[5]),
        },
        # reference bev output is NCHW
        "outputs": {"bev": np.transpose(np.asarray(out), (0, 3, 1, 2))},
        "state_dict": sd,
        "family": family,
        "variant": variant,
    }
    path = str(tmp_path / "trace.pkl")
    with open(path, "wb") as f:
        pickle.dump(trace, f)

    report = check_parity(path)
    assert report["bev"]["pass"], report
    assert report["bev"]["argmax_match"] == 1.0

    # corrupt one weight -> must fail (final output conv bias: direct shift)
    sd2 = dict(sd)
    k = "bevencode.up2.4.bias"
    sd2[k] = sd2[k] + 1.0
    trace["state_dict"] = sd2
    with open(path, "wb") as f:
        pickle.dump(trace, f)
    report = check_parity(path)
    assert not report["bev"]["pass"]
