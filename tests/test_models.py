"""Model forward smoke tests (shapes + param flow), mirroring the reference's
__main__ tests but as a real suite. Uses b0 + small batch for CPU speed."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss2_multimodal_nu_tpu.config import Config, ModelConfig
from lss2_multimodal_nu_tpu.models.factory import build_model


def small_cfg(family: str, **model_kw) -> Config:
    return Config(model=ModelConfig(family=family, effnet_variant="b0", **model_kw))


def fake_batch(b=1, n=6, h=128, w=352, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(b, n, h, w, 3)).astype(np.float32)
    rots = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3)).copy()
    trans = rng.normal(0, 1, (b, n, 3)).astype(np.float32)
    intr = np.broadcast_to(
        np.array([[1266.0, 0, 800.0], [0, 1266.0, 450.0], [0, 0, 1.0]], np.float32),
        (b, n, 3, 3),
    ).copy()
    post_r = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.22, (b, n, 3, 3)).copy()
    post_r[..., 2, 2] = 1.0
    post_t = np.zeros((b, n, 3), np.float32)
    return tuple(map(jnp.asarray, (imgs, rots, trans, intr, post_r, post_t)))


@pytest.fixture(scope="module")
def batch():
    return fake_batch()


def test_lss_forward(batch):
    cfg = small_cfg("lss")
    model = build_model(cfg)
    vars_ = model.init(jax.random.PRNGKey(0), *batch)
    out = model.apply(vars_, *batch)
    assert out.shape == (1, 200, 200, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_bev_txt_forward(batch):
    cfg = small_cfg("bev_txt")
    model = build_model(cfg)
    vars_ = model.init(jax.random.PRNGKey(0), *batch)
    bev, act, desc = model.apply(vars_, *batch)
    assert bev.shape == (1, 200, 200, 4)
    assert act.shape == (1, 4)
    assert desc.shape == (1, 8)


def test_bev_txt_onlybev_forward(batch):
    cfg = small_cfg("bev_txt_onlybev")
    model = build_model(cfg)
    vars_ = model.init(jax.random.PRNGKey(0), *batch)
    bev, act, desc = model.apply(vars_, *batch)
    assert bev.shape == (1, 200, 200, 4)
    assert act.shape == (1, 4)
    assert desc.shape == (1, 8)


def test_bev_txt_detaches_crop(batch):
    """TXT loss must not produce grads into the BEV decoder (stop_gradient,
    reference model_BEV_TXT.py:285)."""
    cfg = small_cfg("bev_txt")
    model = build_model(cfg)
    vars_ = model.init(jax.random.PRNGKey(0), *batch)

    def txt_loss(params):
        _, act, desc = model.apply({**vars_, "params": params}, *batch)
        return jnp.sum(act**2) + jnp.sum(desc**2)

    g = jax.grad(txt_loss)(vars_["params"])
    bev_dec = g["lss"]["bevencode"]
    leaves = jax.tree_util.tree_leaves(bev_dec)
    assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)
    # but the TXT heads do get gradient
    head = g["predictorf2"]
    assert any(float(jnp.abs(l).max()) > 0 for l in jax.tree_util.tree_leaves(head))
