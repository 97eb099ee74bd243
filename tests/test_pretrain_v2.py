"""Stack-B pre-training model + component transfer scheme."""
import numpy as np
import jax
import jax.numpy as jnp

from lss2_multimodal_nu_tpu.config import Config, ModelConfig
from lss2_multimodal_nu_tpu.models.factory import build_model
from lss2_multimodal_nu_tpu.models.vovnet_pretrain import PRETRAIN_COMPONENTS
from lss2_multimodal_nu_tpu.train import checkpoint as ckpt
from lss2_multimodal_nu_tpu.train.losses import cross_entropy_ignore

import sys

sys.path.insert(0, "tests")
from test_models import fake_batch


def test_cross_entropy_ignore_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 6, 6, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 6, 6))
    labels[0, :2] = 255
    got = float(cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    want = torch.nn.CrossEntropyLoss(ignore_index=255)(
        torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(labels)
    )
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_pretrain_model_and_component_transfer(tmp_path):
    cfg = Config(model=ModelConfig(family="vovnet_pretrain", lss_version="v2"))
    model = build_model(cfg)
    batch = fake_batch(b=1)
    vars_ = model.init(jax.random.PRNGKey(0), *batch)
    bev = model.apply(vars_, *batch)
    assert bev.shape == (1, 200, 200, 4)
    assert set(vars_["params"].keys()) == set(PRETRAIN_COMPONENTS)

    # save components, warm-start the FULL model, check exact weight transfer
    path = str(tmp_path / "components")
    ckpt.save_components(path, vars_["params"], vars_["batch_stats"], PRETRAIN_COMPONENTS)

    full_cfg = Config(model=ModelConfig(family="vovnet_transformer", lss_version="v2"))
    full = build_model(full_cfg)
    fvars = full.init(jax.random.PRNGKey(1), *batch)
    p2, bs2 = ckpt.restore_params_loose(path, fvars["params"], fvars["batch_stats"])
    for comp in PRETRAIN_COMPONENTS:
        a = jax.tree_util.tree_leaves(p2[comp])
        b = jax.tree_util.tree_leaves(vars_["params"][comp])
        assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b)), comp
    # non-component modules keep their fresh init
    assert "unified_predictor" in p2
    # ported tree still runs
    out = full.apply({"params": p2, "batch_stats": bs2}, *batch)
    assert out[0].shape == (1, 200, 200, 4)
