"""End-to-end CLI smoke on the synthetic fixture + checkpoint roundtrips."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss2_multimodal_nu_tpu.data.synthetic import generate
from lss2_multimodal_nu_tpu.train import checkpoint as ckpt


@pytest.fixture(scope="module")
def fixture_dataroot(tmp_path_factory):
    """CLI expects dataroot/<version>/..., version='mini'."""
    root = str(tmp_path_factory.mktemp("dataroot"))
    generate(os.path.join(root, "mini"), samples_per_scene=2)
    return root


def test_cli_pretrain_one_epoch(fixture_dataroot, tmp_path):
    from lss2_multimodal_nu_tpu.cli import main

    logdir = str(tmp_path / "log")
    main(
        [
            "pretrain",
            "--version", "mini",
            "--dataroot", fixture_dataroot,
            "--nepochs", "1",
            "--bsize", "2",
            "--nworkers", "2",
            "--logdir", logdir,
            "--effnet_variant", "b0",
            "--H", "90", "--W", "160",
            "--log_every", "1",
        ]
    )
    assert os.path.isdir(os.path.join(logdir, "model0"))
    assert os.path.isfile(os.path.join(logdir, "result.txt"))
    txt = open(os.path.join(logdir, "result.txt")).read()
    assert "mean IoU" in txt
    lines = open(os.path.join(logdir, "metrics.jsonl")).read().strip().splitlines()
    assert len(lines) == 2  # 4 mini_train samples, bs 2 -> 2 steps
    assert np.isfinite(json.loads(lines[-1])["loss"])


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "b": {"k": jnp.ones(4)}}
    bs = {"a": {"mean": jnp.zeros(3)}}
    path = str(tmp_path / "ck")
    ckpt.save_params(path, params, bs)
    init = jax.tree_util.tree_map(jnp.zeros_like, params)
    p2, bs2 = ckpt.restore_params_loose(path, init, jax.tree_util.tree_map(jnp.ones_like, bs))
    np.testing.assert_array_equal(np.asarray(p2["a"]["w"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(bs2["a"]["mean"]), np.zeros(3))


def test_checkpoint_loose_merge_skips_mismatch(tmp_path):
    path = str(tmp_path / "ck2")
    ckpt.save_params(path, {"a": {"w": jnp.ones((2, 3))}}, {})
    # init has a different shape for a/w and an extra module
    init = {"a": {"w": jnp.zeros((4, 3))}, "new": {"k": jnp.full((2,), 7.0)}}
    p2, _ = ckpt.restore_params_loose(path, init, {})
    np.testing.assert_array_equal(np.asarray(p2["a"]["w"]), np.zeros((4, 3)))  # skipped
    np.testing.assert_array_equal(np.asarray(p2["new"]["k"]), [7.0, 7.0])  # kept


def test_component_checkpoint(tmp_path):
    path = str(tmp_path / "ck3")
    params = {"backbone": {"w": jnp.ones(3)}, "head": {"w": jnp.zeros(3)}}
    ckpt.save_components(path, params, {}, ["backbone"])
    tree = ckpt.load_tree(path)
    assert list(tree["params"].keys()) == ["backbone"]
    # warm start merges only what exists
    init = jax.tree_util.tree_map(lambda x: x * 5.0, params)
    merged = ckpt.merge_loose(init, tree["params"])
    np.testing.assert_array_equal(np.asarray(merged["backbone"]["w"]), np.ones(3))
    np.testing.assert_array_equal(np.asarray(merged["head"]["w"]), np.zeros(3))


def test_latest_checkpoint(tmp_path):
    for e in (0, 3, 11):
        os.makedirs(tmp_path / f"model{e}")
    assert ckpt.latest_checkpoint(str(tmp_path)).endswith("model11")
    assert ckpt.latest_checkpoint(str(tmp_path / "missing")) is None


def test_cli_defaults_match_reference_scripts():
    """Lock in per-script defaults (pre_train.py:96-102,
    pre_train_vovnet.py:306-310, train_vovnet_transformer.py:41-42,392-393,
    train.py:108-111, predict.py bsize=1)."""
    import unittest.mock as mock

    from lss2_multimodal_nu_tpu import cli

    def parse(cmd):
        with mock.patch.object(cli, "run_training", lambda args, *a, **k: args), \
             mock.patch.object(cli, "run_predict", lambda args, *a, **k: args), \
             mock.patch.object(cli, "run_predict_iou", lambda args, *a, **k: args):
            return cli.main([cmd, "--dataroot", "/x"])

    a = parse("pretrain")
    assert (a.lr, a.wdecay) == (1e-3, 1e-7)
    a = parse("train")
    assert (a.lr, a.wdecay, a.bsize, a.max_grad_norm) == (1e-4, 1e-8, 6, 5.0)
    a = parse("pretrain-v2")
    assert (a.lr, a.wdecay, a.bsize, a.nepochs) == (1e-4, 1e-8, 12, 60)
    a = parse("train-v2")
    assert (a.wdecay, a.bsize, a.max_grad_norm, a.nepochs) == (1e-8, 8, 10.0, 60)
    a = parse("predict")
    assert a.bsize == 1


def test_async_saver_roundtrip(tmp_path):
    saver = ckpt.AsyncSaver()
    params = {"w": jnp.arange(4.0)}
    path = str(tmp_path / "async_ck")
    saver.save_params(path, params, {})
    saver.wait()
    tree = ckpt.load_tree(path)
    np.testing.assert_array_equal(np.asarray(tree["params"]["w"]), np.arange(4.0))
    saver.close()


def test_preemption_handler(tmp_path):
    import os
    import signal

    h = ckpt.PreemptionHandler()
    assert not h.should_stop()
    os.kill(os.getpid(), signal.SIGTERM)
    assert h.should_stop()
