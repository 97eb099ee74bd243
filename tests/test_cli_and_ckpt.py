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
    # pre_train.py:79 logs to pretrain-result.txt (not train.py's result.txt)
    assert os.path.isfile(os.path.join(logdir, "pretrain-result.txt"))
    txt = open(os.path.join(logdir, "pretrain-result.txt")).read()
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


def _parse_cli(cmd, extra=()):
    import unittest.mock as mock

    from lss2_multimodal_nu_tpu import cli

    with mock.patch.object(cli, "run_training", lambda args, *a, **k: args), \
         mock.patch.object(cli, "run_predict", lambda args, *a, **k: args), \
         mock.patch.object(cli, "run_predict_iou", lambda args, *a, **k: args):
        return cli.main([cmd, "--dataroot", "/x", *extra])


def test_cli_defaults_match_reference_scripts():
    """Lock in per-script defaults (pre_train.py:96-102,
    pre_train_vovnet.py:295-319, train_vovnet_transformer.py:37-51,
    train.py:99-131, predict.py:102-134) — including output paths, worker
    counts, lss_version, and the stack-B validate/save cadences that
    silently diverged until round 5."""
    a = _parse_cli("pretrain")
    assert (a.lr, a.wdecay, a.nepochs, a.nworkers) == (1e-3, 1e-7, 10000, 10)
    assert a.logdir == "./pretrain_result/"
    assert a.results_file == "pretrain-result.txt"
    a = _parse_cli("train")
    assert (a.lr, a.wdecay, a.bsize, a.max_grad_norm) == (1e-4, 1e-8, 6, 5.0)
    assert (a.nepochs, a.nworkers, a.logdir) == (50, 10, "./result-log/")
    assert a.results_file == "result.txt"
    a = _parse_cli("pretrain-v2")
    assert (a.lr, a.wdecay, a.bsize, a.nepochs) == (1e-4, 1e-8, 12, 60)
    assert (a.nworkers, a.lss_version, a.warmup_epochs) == (4, "v1", 5)
    assert a.logdir == "./pretrain_vovnet"
    # validate every 5 epochs + best component ckpt + periodic every 10
    # (pre_train_vovnet.py:430-497)
    assert (a.eval_every, a.ckpt_every, a.save_best) == (5, 10, True)
    a = _parse_cli("train-v2")
    assert (a.wdecay, a.bsize, a.max_grad_norm, a.nepochs) == (1e-8, 8, 10.0, 60)
    assert (a.nworkers, a.lss_version) == (4, "v1")
    assert a.logdir == "./checkpoints_vovnet_transformer"
    assert (a.eval_every, a.ckpt_every, a.save_best) == (5, 10, True)
    # default stage-1 warm start (train_vovnet_transformer.py:49-50)
    assert a.pretrained_path == "./pretrain_vovnet/best_pretrained.pth"
    assert a.no_pretrained is False and a.save_suffix == ""
    a = _parse_cli("predict")
    assert (a.bsize, a.nworkers, a.logdir) == (1, 10, "./test-result/")
    assert (a.lr, a.wdecay) == (1e-3, 1e-7)  # inert, predict.py:113-114
    a = _parse_cli("predict-iou")
    assert (a.bsize, a.logdir) == (1, "./test-result/")


def test_cli_aug_defaults_match_reference_scripts():
    """Every data_aug_conf field per subcommand vs the reference argparse /
    inline dicts — rand_flip diverged silently for four rounds because the
    defaults test above never covered aug fields (VERDICT r4 weak-3).

    rand_flip: True for pre_train.py:117, pre_train_vovnet.py:341,
    train_vovnet_transformer.py:383, predict.py:129; False for train.py:126.
    The remaining fields are identical across all five scripts
    (e.g. train.py:120-127)."""
    RAND_FLIP = {
        "pretrain": True, "train": False, "train-onlybev": False,
        "pretrain-v2": True, "train-v2": True,
        "predict": True, "predict-iou": True,
    }
    for cmd, want_flip in RAND_FLIP.items():
        a = _parse_cli(cmd)
        assert a.rand_flip is want_flip, cmd
        assert tuple(a.resize_lim) == (0.193, 0.225), cmd
        assert tuple(a.bot_pct_lim) == (0.0, 0.22), cmd
        assert tuple(a.rot_lim) == (-5.4, 5.4), cmd
        assert tuple(a.final_dim) == (128, 352), cmd
        assert (a.H, a.W, a.ncams) == (900, 1600, 6), cmd
    # the flag is overridable both ways (BooleanOptionalAction)
    assert _parse_cli("train", ["--rand_flip"]).rand_flip is True
    assert _parse_cli("pretrain", ["--no-rand_flip"]).rand_flip is False


class _Stop(Exception):
    pass


def _capture_loader_wiring(cmd, monkeypatch, host=(0, 1)):
    from lss2_multimodal_nu_tpu import cli
    from lss2_multimodal_nu_tpu.parallel import multihost

    calls = {}

    def fake_loaders(cfg, with_txt, split_family, test=False, **kw):
        calls.update(with_txt=with_txt, split_family=split_family, test=test,
                     host_shard=kw.get("host_shard", (0, 1)))
        raise _Stop

    monkeypatch.setattr(cli, "_loaders", fake_loaders)
    monkeypatch.setattr(multihost, "initialize", lambda *a, **k: host)
    monkeypatch.setattr(multihost, "host_shard", lambda: host)
    import tempfile

    try:
        with tempfile.TemporaryDirectory() as td:
            cli.main([cmd, "--dataroot", "/x", "--logdir", td])
    except _Stop:
        pass
    assert calls, f"{cmd} never reached _loaders"
    return calls


def test_cli_loader_wiring_matches_reference(monkeypatch):
    """The (split_family, with_txt, test) triple each subcommand hands
    `_loaders` — wiring, not flag defaults (VERDICT r4 weak-2: pretrain-v2
    was silently on the wrong split family with the wrong tuple shape).

    References: pre_train.py:29/pre_train_vovnet.py:23+363 use
    data_pretrain.compile_data (datasplit_npre = full-nuScenes splits,
    7-tuple, no act/desc); train.py:29/train_vovnet_transformer.py:459 use
    data.compile_data (nu-A2D splits, 9-tuple); predict.py:68 uses
    compile_data_test; predict.py:11-51 iou_predict uses data_pretrain."""
    WIRING = {
        "pretrain": ("nuscenes_full", False, False),
        "train": ("nu_a2d", True, False),
        "train-onlybev": ("nu_a2d", True, False),
        "pretrain-v2": ("nuscenes_full", False, False),
        "train-v2": ("nu_a2d", True, False),
        "predict": ("nu_a2d", True, True),
        "predict-iou": ("nuscenes_full", False, False),
    }
    for cmd, (family, with_txt, test) in WIRING.items():
        calls = _capture_loader_wiring(cmd, monkeypatch)
        assert calls["split_family"] == family, cmd
        assert calls["with_txt"] is with_txt, cmd
        assert calls["test"] is test, cmd


def test_cli_training_passes_host_shard(monkeypatch):
    """run_training forwards multihost.host_shard() into _loaders so each
    pod host iterates a disjoint data shard (VERDICT r4 weak-5: the library
    existed but the CLI never called it)."""
    for cmd in ("train", "pretrain-v2", "train-v2", "predict"):
        calls = _capture_loader_wiring(cmd, monkeypatch, host=(1, 2))
        assert calls["host_shard"] == (1, 2), cmd


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


def test_stage1_to_stage2_warm_start_transfers_lss(tmp_path):
    """The stack-A chain: a stage-1 `lss`-family checkpoint (root keys
    encoder/camencode/bevencode) must warm-start `bev_txt` (which nests the
    same modules under 'lss'), mirroring the reference's strict=False load
    of a pre_train.py checkpoint into BEV_TXT (train.py:37-39; BEV_TXT
    declares the modules at its root, model_BEV_TXT.py:160-174)."""
    from lss2_multimodal_nu_tpu.config import Config, ModelConfig
    from lss2_multimodal_nu_tpu.models.factory import build_model

    import sys

    sys.path.insert(0, "tests")
    from test_models import fake_batch

    cfg1 = Config(model=ModelConfig(family="lss", effnet_variant="b0"))
    m1 = build_model(cfg1)
    batch = fake_batch(b=1)
    v1 = m1.init(jax.random.PRNGKey(0), *batch)
    assert "camencode" in v1["params"]  # stage-1 root layout
    path = str(tmp_path / "stage1")
    ckpt.save_params(path, v1["params"], v1["batch_stats"])

    cfg2 = Config(model=ModelConfig(family="bev_txt", effnet_variant="b0"))
    m2 = build_model(cfg2)
    v2 = m2.init(jax.random.PRNGKey(1), *batch)
    assert "lss" in v2["params"]  # stage-2 nests the shared trunk
    p2, bs2 = ckpt.restore_params_loose(path, v2["params"], v2["batch_stats"])
    # every stage-1 tensor transferred into the nested subtree
    for mod in ("encoder", "camencode", "bevencode"):
        got = jax.tree_util.tree_leaves(p2["lss"][mod])
        want = jax.tree_util.tree_leaves(v1["params"][mod])
        assert len(got) == len(want) > 0, mod
        assert all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(got, want)
        ), mod
    # TXT-branch modules keep their fresh init (not clobbered)
    assert "sceneunder" in p2
    # reverse direction: a bev_txt checkpoint warm-starts an LSS model
    path2 = str(tmp_path / "stage2")
    ckpt.save_params(path2, p2, bs2)
    p1b, _ = ckpt.restore_params_loose(path2, v1["params"], v1["batch_stats"])
    got = jax.tree_util.tree_leaves(p1b["camencode"])
    want = jax.tree_util.tree_leaves(v1["params"]["camencode"])
    assert all(
        np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(got, want)
    )


def test_multihost_eval_reduce():
    """Global metric assembly across fake pod hosts: confmat summed,
    loss/count summed, per-sample act/desc arrays concatenated in process
    order (cli._multihost_eval_reduce with an injected allgather)."""
    from lss2_multimodal_nu_tpu.cli import _multihost_eval_reduce

    HOSTS = 2

    def fake_allgather(x):  # leading axis = process, like process_allgather
        return np.stack([np.asarray(x) + 0 * h for h in range(HOSTS)])

    confmat = jnp.asarray([[3, 1], [0, 2]], jnp.int32)
    acts_p = [np.ones((2, 4), bool), np.zeros((2, 4), bool)]
    descs_p = [np.ones((2, 8), bool)] * 2
    acts_t = [np.ones((2, 4), np.float32)] * 2
    descs_t = [np.zeros((2, 8), np.float32)] * 2
    cm, loss, n, ap, dp_, at, dt = _multihost_eval_reduce(
        confmat, 10.0, 4, acts_p, descs_p, acts_t, descs_t,
        allgather=fake_allgather,
    )
    np.testing.assert_array_equal(np.asarray(cm), HOSTS * np.asarray(confmat))
    assert (loss, n) == (20.0, 8)
    assert ap[0].shape == (HOSTS * 4, 4)  # 2 local batches x2 samples, x hosts
    assert dp_[0].shape == (HOSTS * 4, 8)
    # process-order concat: first host's 4 rows, then second's
    np.testing.assert_array_equal(ap[0][:2], np.ones((2, 4), bool))


def test_cli_pretrain_v2_checkpoint_surface(fixture_dataroot, tmp_path):
    """`cli pretrain-v2` (stack-B stage 1) on the fixture: NO per-epoch bare
    params (stack B never writes model{N}.pt); best COMPONENT checkpoint
    `best_pretrained` + periodic `pretrained_epoch_{N}` with 1-based epoch
    numbering (pre_train_vovnet.py:430-497)."""
    from lss2_multimodal_nu_tpu.cli import main
    from lss2_multimodal_nu_tpu.models.vovnet_pretrain import PRETRAIN_COMPONENTS

    logdir = str(tmp_path / "log")
    main(
        [
            "pretrain-v2",
            "--version", "mini",
            "--dataroot", fixture_dataroot,
            "--nepochs", "1",
            "--bsize", "2",
            "--nworkers", "2",
            "--logdir", logdir,
            "--H", "90", "--W", "160",
            # shrink the BEV grid so the CPU transformer stays cheap
            "--xbound", "-10", "10", "0.5",
            "--ybound", "-10", "10", "0.5",
            "--eval_every", "1", "--ckpt_every", "1",
        ]
    )
    assert not os.path.isdir(os.path.join(logdir, "model0"))
    assert not os.path.isdir(os.path.join(logdir, "model1"))
    best = os.path.join(logdir, "best_pretrained")
    periodic = os.path.join(logdir, "pretrained_epoch_1")
    assert os.path.isdir(best) and os.path.isdir(periodic)
    assert os.path.isdir(os.path.join(logdir, "state_latest"))
    tree = ckpt.load_tree(best)
    assert list(tree["components"]) == list(PRETRAIN_COMPONENTS)
    assert set(tree["params"]) <= set(PRETRAIN_COMPONENTS)
    assert tree["extra"]["epoch"] == 1
    assert tree["extra"]["lss_version"] == "v1"  # pre_train_vovnet.py:301
    assert np.isfinite(tree["extra"]["miou"])


def test_train_v2_default_stage1_warmstart(tmp_path):
    """train-v2 loads ./pretrain_vovnet/best_pretrained.pth-equivalent by
    default (train_vovnet_transformer.py:428-449); --no_pretrained and an
    absent file both fall back to the fresh init."""
    from types import SimpleNamespace

    from lss2_multimodal_nu_tpu.cli import _maybe_stage1_warmstart

    class FakeState(SimpleNamespace):
        def replace(self, **kw):
            return FakeState(**{**self.__dict__, **kw})

    comp = str(tmp_path / "best_pretrained")
    ckpt.save_components(
        comp, {"backbone": {"w": jnp.ones(3)}}, {}, ["backbone"],
        extra={"miou": 0.5},
    )
    init = FakeState(
        params={"backbone": {"w": jnp.zeros(3)}, "head": {"w": jnp.zeros(2)}},
        batch_stats={},
    )
    args = SimpleNamespace(checkpoint="", resume=False, no_pretrained=False,
                           pretrained_path=comp)
    out = _maybe_stage1_warmstart(args, "vovnet_transformer", init)
    np.testing.assert_array_equal(np.asarray(out.params["backbone"]["w"]), np.ones(3))
    np.testing.assert_array_equal(np.asarray(out.params["head"]["w"]), np.zeros(2))
    # --no_pretrained / missing file / other family: untouched
    for a, fam in (
        (SimpleNamespace(**{**args.__dict__, "no_pretrained": True}), "vovnet_transformer"),
        (SimpleNamespace(**{**args.__dict__, "pretrained_path": comp + "_missing"}), "vovnet_transformer"),
        (args, "bev_txt"),
    ):
        out = _maybe_stage1_warmstart(a, fam, init)
        np.testing.assert_array_equal(
            np.asarray(out.params["backbone"]["w"]), np.zeros(3)
        )


def test_cli_predict_end_to_end(fixture_dataroot, tmp_path):
    """`cli predict` on the fixture: eval at batch 1 on the test split,
    test.txt surface written (predict.py:97-99), composed viz figures
    rendered via --viz_dir."""
    from lss2_multimodal_nu_tpu.cli import main

    out_file = str(tmp_path / "test.txt")
    viz_dir = str(tmp_path / "viz")
    main(
        [
            "predict",
            "--version", "mini",
            "--dataroot", fixture_dataroot,
            "--nworkers", "2",
            "--logdir", str(tmp_path / "log"),
            "--effnet_variant", "b0",
            "--H", "90", "--W", "160",
            "--out_file", out_file,
            "--viz_dir", viz_dir, "--viz_count", "1",
        ]
    )
    txt = open(out_file).read()
    assert "mean IoU" in txt
    # reference format (predict.py:97-99): checkpoint line, confmat repr,
    # then the indented F1_info block
    assert "F1_info:" in txt
    for field in ("F1_Action:", "F1_Description:", "Action_overall:",
                  "Description_overall:", "Action_mean:", "Description_mean:"):
        assert field in txt, field
    mean_line = [l for l in txt.splitlines() if "Action_mean:" in l][0]
    assert np.isfinite(float(mean_line.split(":")[1]))
    desc_line = [l for l in txt.splitlines() if "F1_Description:" in l][0]
    assert len(json.loads(desc_line.split(":", 1)[1])) == 8
    assert os.path.isfile(os.path.join(viz_dir, "pred_000.png"))


def test_cli_predict_iou_end_to_end(fixture_dataroot, tmp_path):
    """`cli predict-iou`: BEV-only checkpoint eval on the pretrain val
    split, appending the b1_20.txt surface (reference predict.py:11-51)."""
    from lss2_multimodal_nu_tpu.cli import main

    out_file = str(tmp_path / "b1_20.txt")
    main(
        [
            "predict-iou",
            "--version", "mini",
            "--dataroot", fixture_dataroot,
            "--nworkers", "2",
            "--logdir", str(tmp_path / "log"),
            "--effnet_variant", "b0",
            "--H", "90", "--W", "160",
            "--out_file", out_file,
        ]
    )
    txt = open(out_file).read()
    assert txt.startswith("checkpoint:")
    assert "mean IoU" in txt and "val_loss:" in txt
