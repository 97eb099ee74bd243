"""Distributed tests on the virtual 8-device CPU mesh (SURVEY §4(e)):
dp x fsdp sharded train step compiles, runs, and matches single-device math."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss2_multimodal_nu_tpu.config import Config, MeshConfig, ModelConfig, TrainConfig
from lss2_multimodal_nu_tpu.models.factory import build_model
from lss2_multimodal_nu_tpu.parallel.mesh import (
    activate_mesh,
    batch_sharding,
    constrain_batch,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_state,
)
from lss2_multimodal_nu_tpu.train.state import create_train_state
from lss2_multimodal_nu_tpu.train.steps import make_train_step

import sys

sys.path.insert(0, "tests")
from test_models import fake_batch


def _cfg(dp, fsdp):
    return Config(
        model=ModelConfig(family="lss", effnet_variant="b0"),
        train=TrainConfig(batch_size=8),
        mesh=MeshConfig(dp=dp, fsdp=fsdp),
    )


def _batch(b=8):
    rng = np.random.default_rng(0)
    inputs = fake_batch(b=b)
    return dict(
        zip(("imgs", "rots", "trans", "intrins", "post_rots", "post_trans"), inputs)
        , binimg=jnp.asarray(rng.integers(0, 4, size=(b, 200, 200)))
    )


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_mesh_construction():
    mesh = make_mesh(_cfg(4, 2))
    assert mesh.shape == {"dp": 4, "fsdp": 2}


def test_constrain_batch_hint():
    """constrain_batch is a no-op without an ambient mesh, and pins the
    batch dim to (dp, fsdp) when one is active (VERDICT r3 item 2)."""
    x = jnp.zeros((8, 6, 16))
    # no mesh: identity (same trace, no constraint op)
    assert constrain_batch(x) is x
    mesh = make_mesh(_cfg(4, 2))
    with activate_mesh(mesh):
        y = jax.jit(lambda t: constrain_batch(t * 2))(shard_batch(mesh, x))
        assert "dp" in str(y.sharding.spec) and "fsdp" in str(y.sharding.spec)
        # non-divisible batch dim: silently skipped, not an error
        z = jnp.zeros((3, 4))
        assert constrain_batch(z) is z


def test_param_sharding_rules():
    mesh = make_mesh(_cfg(4, 2))
    params = {
        "big": jnp.zeros((256, 64)),
        "odd": jnp.zeros((33333,)),  # not divisible by 2 -> replicated
        "small": jnp.zeros((4,)),
    }
    sh = param_sharding(mesh, params, min_shard_elems=100)
    assert "fsdp" in str(sh["big"].spec)
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"].spec == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("dp,fsdp", [(8, 1), (4, 2)])
def test_sharded_train_step_runs_and_matches(dp, fsdp):
    cfg = _cfg(dp, fsdp)
    model = build_model(cfg)
    batch = _batch(8)
    inputs = tuple(batch[k] for k in ("imgs", "rots", "trans", "intrins", "post_rots", "post_trans"))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), tuple(x[:1] for x in inputs))
    step = make_train_step(cfg, model)

    # the step donates its input state, so build an independent, identically
    # initialized state for the sharded run
    state2 = create_train_state(cfg, model, jax.random.PRNGKey(0), tuple(x[:1] for x in inputs))
    mesh = make_mesh(cfg)
    state_sh = shard_state(mesh, state2)
    batch_sh = shard_batch(mesh, batch)

    # single-device (replicated-on-one) result
    s_ref, m_ref = step(state, batch, jax.random.PRNGKey(7))
    loss_ref = float(m_ref["loss"])
    s_out, m_out = step(state_sh, batch_sh, jax.random.PRNGKey(7))
    loss_sh = float(m_out["loss"])

    np.testing.assert_allclose(loss_sh, loss_ref, rtol=5e-4)
    # updated params agree
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_ref.params, jax.device_get(s_out.params)
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-3
    # fsdp>1: check at least one param is actually sharded
    if fsdp > 1:
        shardings = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x.sharding, s_out.params)
        )
        assert any("fsdp" in str(s.spec) for s in shardings)


def test_sharded_train_state_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a dp=4 x fsdp=2 sharded TrainState — the thing a
    real pod run needs (round-2 VERDICT weak item 3). The state is trained one
    step (so Adam moments are nonzero), saved SHARDED, restored into a freshly
    initialized state, re-sharded, and must (a) equal the original bitwise and
    (b) keep training."""
    from lss2_multimodal_nu_tpu.train import checkpoint as ckpt

    cfg = _cfg(4, 2)
    model = build_model(cfg)
    batch = _batch(8)
    inputs = tuple(
        batch[k] for k in ("imgs", "rots", "trans", "intrins", "post_rots", "post_trans")
    )
    mesh = make_mesh(cfg)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(3), tuple(x[:1] for x in inputs)
    )
    state = shard_state(mesh, state)
    step = make_train_step(cfg, model)
    state, _ = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(11))
    # at least one saved param is genuinely sharded at save time
    assert any(
        "fsdp" in str(x.sharding.spec)
        for x in jax.tree_util.tree_leaves(state.params)
    )

    path = tmp_path / "sharded_state"
    ckpt.save_train_state(str(path), state, {"epoch": 0})

    # fresh differently-seeded state -> restore -> re-shard
    fresh = create_train_state(
        cfg, model, jax.random.PRNGKey(99), tuple(x[:1] for x in inputs)
    )
    restored = ckpt.restore_train_state(str(path), fresh)
    restored = shard_state(mesh, restored)

    assert int(restored.step) == int(state.step) == 1
    for name, a, b in (
        ("params", restored.params, state.params),
        ("batch_stats", restored.batch_stats, state.batch_stats),
        ("opt_state", restored.opt_state, state.opt_state),
    ):
        da = jax.tree_util.tree_map(
            lambda x, y: float(jnp.abs(jnp.asarray(x) - jnp.asarray(y)).max())
            if hasattr(x, "shape") else 0.0,
            jax.device_get(a), jax.device_get(b),
        )
        worst = max(jax.tree_util.tree_leaves(da), default=0.0)
        assert worst == 0.0, (name, worst)

    # restored state trains onward under the mesh
    restored, metrics = step(restored, shard_batch(mesh, batch), jax.random.PRNGKey(12))
    assert np.isfinite(float(metrics["loss"]))
