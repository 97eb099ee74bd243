"""Weight-porting tests: structural coverage for every model family against
synthetic torch state dicts, plus functional parity for ported MHA and
ResNet blocks against torch oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss2_multimodal_nu_tpu.config import Config, ModelConfig
from lss2_multimodal_nu_tpu.models.factory import build_model
from lss2_multimodal_nu_tpu.port.torch_port import build_porter, port_state_dict

torch = pytest.importorskip("torch")

import sys

sys.path.insert(0, "tests")
from test_models import fake_batch


def fake_torch_state(porter, flax_params, flax_bs):
    """Invert the conversion: for each rule derive the torch-side shape from
    the flax leaf and fill with random values."""
    rng = np.random.default_rng(0)
    sd = {}

    def leaf(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node

    for path, tkey, kind in porter.rules:
        if path[0] == "__bs__":
            arr = leaf(flax_bs, path[1:])
        else:
            arr = leaf(flax_params, path)
        shape = np.shape(arr)
        if kind == "conv":
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif kind == "dwconv":
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif kind == "linear":
            tshape = (shape[1], shape[0])
        elif kind.startswith("inproj"):
            c = shape[0] if kind.endswith("b") else shape[1]
            tshape = (3 * c,) if kind.endswith("b") else (3 * c, shape[0])
        else:
            tshape = shape
        if tkey not in sd:
            if tkey.endswith("running_var"):
                sd[tkey] = rng.uniform(0.5, 2.0, size=tshape).astype(np.float32)
            else:
                sd[tkey] = rng.normal(scale=0.05, size=tshape).astype(np.float32)
    return sd


def assert_trees_match(ported, init, prefix=""):
    assert set(ported.keys()) == set(init.keys()), (
        prefix, sorted(set(init) - set(ported)), sorted(set(ported) - set(init)))
    for k in init:
        if isinstance(init[k], dict):
            assert_trees_match(ported[k], init[k], prefix + "/" + k)
        else:
            assert np.shape(ported[k]) == np.shape(init[k]), (prefix + "/" + k)


@pytest.mark.parametrize(
    "family,kw",
    [
        ("lss", {"variant": "b0"}),
        ("bev_txt", {"variant": "b0"}),
        ("bev_txt_onlybev", {"variant": "b0"}),
        ("vovnet_transformer", {"model_name": "vovnet39"}),
    ],
)
def test_port_full_coverage(family, kw):
    cfg = Config(model=ModelConfig(family=family, effnet_variant="b0"))
    model = build_model(cfg)
    batch = fake_batch(b=1)
    vars_ = model.init(jax.random.PRNGKey(0), *batch)
    porter = build_porter(family, **kw)
    sd = fake_torch_state(porter, vars_["params"], vars_["batch_stats"])
    params, bs, missing = porter.run(sd)
    assert not missing
    assert_trees_match(params, vars_["params"])
    assert_trees_match(bs, vars_["batch_stats"])


def test_ported_mha_matches_torch():
    from lss2_multimodal_nu_tpu.nn.fusion import MultiHeadAttention
    from lss2_multimodal_nu_tpu.port.torch_port import Porter

    torch.manual_seed(0)
    d, heads, B, Nq, Nk = 32, 4, 2, 6, 3
    tm = torch.nn.MultiheadAttention(d, heads, dropout=0.0, batch_first=True)
    q = torch.randn(B, Nq, d)
    k = torch.randn(B, Nk, d)
    v = torch.randn(B, Nk, d)
    want, _ = tm(q, k, v)

    p = Porter()
    p.mha("attn", "mha")
    sd = {kk.replace("", ""): vv.detach().numpy() for kk, vv in tm.state_dict().items()}
    sd = {f"mha.{kk}": vv for kk, vv in sd.items()}
    params, _, missing = p.run(sd)
    assert not missing

    m = MultiHeadAttention(d_model=d, n_heads=heads, dropout=0.0)
    got = m.apply(
        {"params": params["attn"]},
        jnp.asarray(q.numpy()), jnp.asarray(k.numpy()), jnp.asarray(v.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_ported_basic_block_matches_torch():
    """BasicBlock with downsample vs a torch functional implementation using
    the same (randomly initialized) torch parameters."""
    from lss2_multimodal_nu_tpu.nn.lss_modules import BasicBlock
    from lss2_multimodal_nu_tpu.port.torch_port import Porter, add_basic_block

    rng = np.random.default_rng(1)
    cin, cout, stride = 8, 16, 2
    sd = {
        "blk.conv1.weight": rng.normal(scale=0.1, size=(cout, cin, 3, 3)).astype(np.float32),
        "blk.bn1.weight": rng.uniform(0.5, 1.5, cout).astype(np.float32),
        "blk.bn1.bias": rng.normal(size=cout).astype(np.float32),
        "blk.bn1.running_mean": rng.normal(size=cout).astype(np.float32),
        "blk.bn1.running_var": rng.uniform(0.5, 2.0, cout).astype(np.float32),
        "blk.conv2.weight": rng.normal(scale=0.1, size=(cout, cout, 3, 3)).astype(np.float32),
        "blk.bn2.weight": rng.uniform(0.5, 1.5, cout).astype(np.float32),
        "blk.bn2.bias": rng.normal(size=cout).astype(np.float32),
        "blk.bn2.running_mean": rng.normal(size=cout).astype(np.float32),
        "blk.bn2.running_var": rng.uniform(0.5, 2.0, cout).astype(np.float32),
        "blk.downsample.0.weight": rng.normal(scale=0.1, size=(cout, cin, 1, 1)).astype(np.float32),
        "blk.downsample.1.weight": rng.uniform(0.5, 1.5, cout).astype(np.float32),
        "blk.downsample.1.bias": rng.normal(size=cout).astype(np.float32),
        "blk.downsample.1.running_mean": rng.normal(size=cout).astype(np.float32),
        "blk.downsample.1.running_var": rng.uniform(0.5, 2.0, cout).astype(np.float32),
    }
    p = Porter()
    add_basic_block(p, "b", "blk", downsample=True)
    params, bs, missing = p.run(sd)
    assert not missing

    x = rng.normal(size=(2, 10, 12, cin)).astype(np.float32)
    m = BasicBlock(cout, stride=stride)
    got = np.asarray(
        m.apply({"params": params["b"], "batch_stats": bs["b"]}, jnp.asarray(x))
    )

    # torch functional oracle
    import torch.nn.functional as F

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)

    def bn(t, prefix):
        return F.batch_norm(
            t,
            torch.from_numpy(sd[f"{prefix}.running_mean"]),
            torch.from_numpy(sd[f"{prefix}.running_var"]),
            torch.from_numpy(sd[f"{prefix}.weight"]),
            torch.from_numpy(sd[f"{prefix}.bias"]),
            training=False, eps=1e-5,
        )

    y = F.conv2d(xt, torch.from_numpy(sd["blk.conv1.weight"]), stride=stride, padding=1)
    y = F.relu(bn(y, "blk.bn1"))
    y = F.conv2d(y, torch.from_numpy(sd["blk.conv2.weight"]), padding=1)
    y = bn(y, "blk.bn2")
    idt = F.conv2d(xt, torch.from_numpy(sd["blk.downsample.0.weight"]), stride=stride)
    idt = bn(idt, "blk.downsample.1")
    want = F.relu(y + idt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
