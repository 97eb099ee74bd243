"""Training-layer tests: losses vs torch, metrics vs sklearn, torch-Adam
semantics, schedule shape, end-to-end train step on a tiny model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss2_multimodal_nu_tpu.config import Config, ModelConfig, TrainConfig
from lss2_multimodal_nu_tpu.train import losses as L
from lss2_multimodal_nu_tpu.train import metrics as M
from lss2_multimodal_nu_tpu.train.state import (
    build_optimizer,
    warmup_cosine_schedule,
    _torch_adam,
)

torch = pytest.importorskip("torch")
sklearn_metrics = pytest.importorskip("sklearn.metrics")


def test_weighted_ce_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 10, 10, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(4, 10, 10))
    got = float(L.simple_loss(jnp.asarray(logits), jnp.asarray(labels)))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    loss = torch.nn.CrossEntropyLoss(weight=torch.tensor([1.0, 10, 5, 10]))(
        lt, torch.from_numpy(labels)
    )
    np.testing.assert_allclose(got, float(loss), rtol=1e-5)


def test_bce_weight_and_pos_weight_match_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 8)).astype(np.float32)
    targets = rng.integers(0, 2, size=(8, 8)).astype(np.float32)
    w = np.array(L.DESC_WEIGHTS, dtype=np.float32)
    got = float(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), weight=w))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), weight=torch.from_numpy(w)
    )
    np.testing.assert_allclose(got, float(want), rtol=1e-5)

    pw = np.array(L.DESC_POS_WEIGHT_V2, dtype=np.float32)
    got = float(
        L.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), pos_weight=pw)
    )
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets),
        pos_weight=torch.from_numpy(pw),
    )
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_multi_loss_composition():
    rng = np.random.default_rng(2)
    bev = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
    blab = rng.integers(0, 4, size=(2, 5, 5))
    act = rng.normal(size=(2, 4)).astype(np.float32)
    desc = rng.normal(size=(2, 8)).astype(np.float32)
    al = rng.integers(0, 2, (2, 4)).astype(np.float32)
    dl = rng.integers(0, 2, (2, 8)).astype(np.float32)
    total = float(L.multi_loss(*map(jnp.asarray, (bev, act, desc, blab, al, dl))))
    parts = (
        float(L.weighted_cross_entropy(jnp.asarray(bev), jnp.asarray(blab), L.BEV_CLASS_WEIGHTS))
        + float(L.bce_with_logits(jnp.asarray(act), jnp.asarray(al), weight=L.ACT_WEIGHTS))
        + float(L.bce_with_logits(jnp.asarray(desc), jnp.asarray(dl), weight=L.DESC_WEIGHTS))
    )
    np.testing.assert_allclose(total, parts, rtol=1e-6)


def test_confusion_matrix_and_iou():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 4, size=(1000,))
    preds = rng.integers(0, 4, size=(1000,))
    mat = np.asarray(
        M.confusion_matrix_update(jnp.zeros((4, 4), jnp.int32), jnp.asarray(labels), jnp.asarray(preds), 4)
    )
    want = sklearn_metrics.confusion_matrix(labels, preds, labels=range(4))
    np.testing.assert_array_equal(mat, want)
    m = M.confusion_matrix_compute(mat)
    want_iou = sklearn_metrics.jaccard_score(labels, preds, average=None)
    np.testing.assert_allclose(m["iou"], want_iou, rtol=1e-9)


def test_f1_matches_sklearn():
    rng = np.random.default_rng(4)
    t = rng.integers(0, 2, size=(200, 8))
    p = rng.integers(0, 2, size=(200, 8))
    per, overall, mean = M.per_class_and_macro_f1(t, p)
    for i in range(8):
        np.testing.assert_allclose(
            per[i], sklearn_metrics.f1_score(t[:, i], p[:, i]), rtol=1e-9
        )
    np.testing.assert_allclose(
        overall,
        sklearn_metrics.f1_score(t.reshape(-1), p.reshape(-1), average="macro"),
        rtol=1e-9,
    )


def test_torch_adam_semantics():
    """Single step of our chain vs torch.optim.Adam with weight_decay."""
    rng = np.random.default_rng(5)
    p0 = rng.normal(size=(7, 3)).astype(np.float32)
    g = rng.normal(size=(7, 3)).astype(np.float32)
    lr, wd = 1e-3, 1e-2

    tx = _torch_adam(lr, wd)
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g)}, opt_state, params)
    new = np.asarray(params["w"] + updates["w"])

    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([pt], lr=lr, weight_decay=wd)
    pt.grad = torch.from_numpy(g.copy())
    opt.step()
    np.testing.assert_allclose(new, pt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_warmup_cosine_schedule_matches_reference_lambda():
    base, warm, total, floor = 1e-4, 100, 1000, 1e-6
    sched = warmup_cosine_schedule(base, warm, total, floor)

    def ref(step):  # train_vovnet_transformer.py:56-60
        if step < warm:
            return step / max(1, warm)
        progress = (step - warm) / max(1, total - warm)
        return max(floor, 0.5 * (1 + np.cos(np.pi * progress)))

    for s in [0, 1, 50, 99, 100, 500, 999, 1000]:
        np.testing.assert_allclose(
            float(sched(s)), base * ref(s), rtol=1e-2, atol=1e-12, err_msg=str(s)
        )


def test_param_group_labels():
    cfg = Config(model=ModelConfig(family="vovnet_transformer"))
    tx = build_optimizer(cfg)
    params = {
        "backbone": {"k": jnp.ones(3)},
        "depth_net": {"k": jnp.ones(3)},
        "unified_predictor": {"k": jnp.ones(3)},
    }
    # lr 1e-4 for new, 1e-5 for pretrained: check update magnitudes differ
    opt_state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(g, opt_state, params)
    up_back = float(jnp.abs(updates["backbone"]["k"]).max())
    up_new = float(jnp.abs(updates["unified_predictor"]["k"]).max())
    assert up_new > up_back * 5


def test_train_step_lss_tiny():
    """End-to-end: two train steps decrease nothing crazy; state updates."""
    import sys

    sys.path.insert(0, "tests")
    from test_models import fake_batch

    from lss2_multimodal_nu_tpu.models.factory import build_model
    from lss2_multimodal_nu_tpu.train.state import create_train_state
    from lss2_multimodal_nu_tpu.train.steps import make_eval_step, make_train_step

    cfg = Config(
        model=ModelConfig(family="lss", effnet_variant="b0"),
        train=TrainConfig(batch_size=1),
    )
    model = build_model(cfg)
    inputs = fake_batch(b=1)
    rng = np.random.default_rng(6)
    batch = dict(
        zip(
            ("imgs", "rots", "trans", "intrins", "post_rots", "post_trans"), inputs
        ),
        binimg=jnp.asarray(rng.integers(0, 4, size=(1, 200, 200))),
    )
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), inputs)
    # the train step donates its input state: snapshot values first
    params0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.params)
    stats0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.batch_stats)
    step = make_train_step(cfg, model)
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(1))
    assert int(s2.step) == 2
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # params actually changed
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), params0, s2.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    # batch stats updated
    bs = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), stats0, s2.batch_stats)
    assert max(jax.tree_util.tree_leaves(bs)) > 0

    ev = make_eval_step(cfg, model)
    res = ev(s2.params, s2.batch_stats, batch, jnp.zeros((4, 4), jnp.int32))
    assert int(res["confmat"].sum()) == 200 * 200


def test_grad_watch_summaries():
    """watch_gradients=True (the wandb.watch surface,
    train_vovnet_transformer.py:505-517): the step emits per-top-module
    gradient norms + fixed-size value samples, consistent with grad_norm."""
    import sys

    sys.path.insert(0, "tests")
    from test_models import fake_batch

    from lss2_multimodal_nu_tpu.models.factory import build_model
    from lss2_multimodal_nu_tpu.train.state import create_train_state
    from lss2_multimodal_nu_tpu.train.steps import make_train_step

    cfg = Config(
        model=ModelConfig(family="lss", effnet_variant="b0"),
        train=TrainConfig(batch_size=1, watch_gradients=True),
    )
    model = build_model(cfg)
    inputs = fake_batch(b=1)
    rng = np.random.default_rng(6)
    batch = dict(
        zip(("imgs", "rots", "trans", "intrins", "post_rots", "post_trans"), inputs),
        binimg=jnp.asarray(rng.integers(0, 4, size=(1, 200, 200))),
    )
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), inputs)
    step = make_train_step(cfg, model)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    norms = {k: float(v) for k, v in metrics.items() if k.startswith("grad_norm/")}
    samples = {k: np.asarray(v) for k, v in metrics.items()
               if k.startswith("grad_sample/")}
    assert norms and set(n.split("/")[1] for n in norms) == set(
        s.split("/")[1] for s in samples
    )
    # per-module norms recombine to the global grad norm
    total = float(metrics["grad_norm"])
    np.testing.assert_allclose(
        np.sqrt(sum(v**2 for v in norms.values())), total, rtol=1e-5
    )
    for k, s in samples.items():
        assert s.ndim == 1 and 0 < s.size <= 2048 and np.isfinite(s).all(), k
