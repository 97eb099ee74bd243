"""Headline benchmark: 6-camera frames/sec/chip on the flagship model
(VoVNet-39 + LSS v2 + transformer, the reference's strongest config).

Prints the headline JSON line IMMEDIATELY after the forward bench (flushed),
then a final enriched line after the extras — the driver parses the tail, so
a timeout mid-extras still leaves a parseable headline (VERDICT r3 item 1).
Extras run under a wall-clock budget ($BENCH_BUDGET_S, default 480 s from
process start); whatever doesn't fit is skipped and listed in `skipped`.

Baseline: the reference reports 25-30 FPS full-model inference on an RTX
3090 (README_TRAINING.md:37); vs_baseline uses the midpoint 27.5.

Timing methodology (round-2 finding): the axon host<->TPU tunnel has a
~25-30 ms per-call floor, so per-call timing understates fast models badly.
Headline: run K batches inside ONE jit via lax.map over stacked inputs
(inputs vary per step, defeating the axon result cache), subtract a
measured floor. Stage split: K-vs-3K slope method (ms = (T(3K)-T(K))/2K) so
the floor cancels exactly and sub-ms stages don't clamp to 0 (r3 item 5).
"""
import gc
import json
import os
import sys
import time

_T0 = time.time()
# r5: 480 -> 1800. The driver's r4 run survived 1580 s wall at rc=0; the
# 480 s SELF-budget (not the driver's timeout) is what erased every extra
# on that cold run (VERDICT r4 item 1c). min_secs below assume warm caches;
# a cold extra may overshoot the budget check — acceptable, because the
# enriched line is reprinted after every completed extra, so a kill
# mid-extras only loses the extra in flight.
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "1800"))


def _remaining() -> float:
    return _BUDGET - (time.time() - _T0)


def measure_floor(jax, jnp):
    xs = [jax.random.normal(jax.random.PRNGKey(s), (128, 128)) for s in range(9)]
    jax.block_until_ready(xs)
    f = jax.jit(lambda x: jnp.sum(x * 2.0))
    float(f(xs[0]))
    t0 = time.time()
    for i in range(1, 9):
        float(f(xs[i]))
    return (time.time() - t0) / 8


def bench_forward(jax, jnp, model, variables, batch, k=8, m=4, floor=0.0):
    # k=8/m=4 (r4): longer scan + more repeats shrink the floor-estimate
    # sensitivity of (best - floor)/k — at k=6 a 2 ms floor error moved the
    # headline by ~0.5 f/s; at k=8 by ~0.4. Same methodology, less variance.
    from __graft_entry__ import _fake_inputs

    sets = [_fake_inputs(b=batch, seed=s) for s in range(k)]
    st = tuple(jnp.stack([s[i] for s in sets]) for i in range(6))
    st = jax.block_until_ready(st)

    @jax.jit
    def fwd_k(v, st):
        def one(t):
            out = model.apply(v, *t)
            if not isinstance(out, tuple):
                out = (out,)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

        return jnp.sum(jax.lax.map(one, st))

    t0 = time.time()
    float(fwd_k(variables, st))  # compile + warm
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(m):
        t0 = time.time()
        float(fwd_k(variables, st))
        best = min(best, time.time() - t0)
    # min over repeats: transient host/tunnel stalls only ever add time
    return max((best - floor) / k, 1e-9), compile_s


def bench_stages(jax, jnp, model, variables, batch, k=8, m=3):
    """Per-stage ms of the flagship forward via the K-vs-3K slope method
    (proven in scripts/bench_backbone.py): each stage runs k and 3k times
    inside one jit; ms = (T(3k) - T(k)) / (2k). The ~28 ms axon call floor
    cancels exactly, so sub-ms stages report real time instead of 0.0.
    Uses the model's own stage methods (encode_cameras / lift_to_bev /
    bev_encoder / txt_branch) so the timed code IS the deployed code."""
    from __graft_entry__ import _fake_inputs

    inputs = _fake_inputs(b=batch, seed=0)

    @jax.jit
    def prefix(v, *ins):
        def go(mod, imgs, rots, trans, intrins, post_rots, post_trans):
            c3, c4 = mod.encode_cameras(imgs, False)
            bev_feats = mod.lift_to_bev(
                c3, c4, rots, trans, intrins, post_rots, post_trans, False
            )
            _, bev_refined = mod.bev_encoder(bev_feats, False)
            return c3, c4, bev_feats, bev_refined

        return model.apply(v, *ins, method=go)

    c3, c4, bev_feats, bev_refined = jax.block_until_ready(
        prefix(variables, *inputs)
    )

    def timed(fn, *xs):
        # one stacked input of 3k jittered copies; the k-run maps over [:k]
        st = tuple(
            jnp.stack([x + jnp.asarray(1e-3 * (i % 7), x.dtype) for i in range(3 * k)])
            for x in xs
        )

        def mk_run(n):
            @jax.jit
            def run(v, st):
                def one(t):
                    out = fn(v, *t)
                    return sum(
                        jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)
                    )

                return jnp.sum(jax.lax.map(one, tuple(s[:n] for s in st)))

            return run

        run_k, run_3k = mk_run(k), mk_run(3 * k)
        st = jax.block_until_ready(st)
        float(run_k(variables, st)), float(run_3k(variables, st))
        best_k = best_3k = float("inf")
        for _ in range(m):
            t0 = time.time()
            float(run_k(variables, st))
            best_k = min(best_k, time.time() - t0)
            t0 = time.time()
            float(run_3k(variables, st))
            best_3k = min(best_3k, time.time() - t0)
        del st
        gc.collect()
        return max(best_3k - best_k, 0.0) / (2 * k) * 1e3

    out = {}
    out["backbone"] = timed(
        lambda v, imgs: model.apply(v, imgs, method="encode_cameras"), inputs[0]
    )
    out["lift_to_bev"] = timed(
        lambda v, *a: model.apply(v, *a, method="lift_to_bev"),
        c3, c4, *inputs[1:],
    )
    out["bev_encoder"] = timed(
        lambda v, bf: model.apply(
            v, bf, method=lambda mod, bf: mod.bev_encoder(bf, False)
        ),
        bev_feats,
    )
    out["txt_branch"] = timed(
        lambda v, *a: model.apply(v, *a, method="txt_branch"),
        c3, bev_refined,
    )
    return {name: round(ms, 2) for name, ms in out.items()}


def estimate_mfu(jax, model, variables, inputs, per_sec_batch, peak_tflops=197.0):
    """MFU from XLA's own cost analysis of the deployed forward. Pallas
    custom-call FLOPs are NOT counted by XLA, so this slightly understates
    true utilization — fine for a regression-tracking metric (the flagship
    is gather-bound; low MFU is the expected, documented profile)."""
    fn = jax.jit(lambda v, *ins: model.apply(v, *ins))
    cost = fn.lower(variables, *inputs).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    if flops <= 0:
        return None, None
    mfu = flops / per_sec_batch / (peak_tflops * 1e12)
    return round(flops / 1e9, 1), round(100.0 * mfu, 2)


def bench_train_step(jax, jnp, cfg, model, batch=2, k=3, m=3, floor=0.0):
    """fwd+bwd+adam steps/s on the flagship train step (scan-amortized)."""
    import numpy as np

    from __graft_entry__ import _fake_inputs
    from lss2_multimodal_nu_tpu.train.state import create_train_state
    from lss2_multimodal_nu_tpu.train.steps import make_train_step

    rng = np.random.default_rng(0)
    nxy = cfg.grid.nx[0]
    inputs = _fake_inputs(b=batch, seed=0)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0), tuple(x[:1] for x in inputs)
    )
    # note: the step's donate_argnums is ignored when inlined under the
    # outer jit'd scan — safe to reuse the scan carry
    step = make_train_step(cfg, model)

    def make_batch(s):
        ins = _fake_inputs(b=batch, seed=s)
        return dict(
            zip(("imgs", "rots", "trans", "intrins", "post_rots", "post_trans"), ins),
            binimg=jnp.asarray(rng.integers(0, 4, size=(batch, nxy, nxy))),
            act=jnp.asarray(rng.integers(0, 2, (batch, 4)).astype(np.float32)),
            desc=jnp.asarray(rng.integers(0, 2, (batch, 8)).astype(np.float32)),
        )

    batches = [make_batch(s) for s in range(k)]
    st = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    st = jax.block_until_ready(st)

    @jax.jit
    def steps_k(state0, st):
        def one(carry, b):
            s, _ = carry
            s2, metrics = step(s, b, jax.random.PRNGKey(0))
            return (s2, metrics["loss"]), ()

        (s_final, loss), _ = jax.lax.scan(one, (state0, jnp.float32(0)), st)
        return loss

    float(steps_k(state, st))
    best = float("inf")
    for _ in range(m):
        t0 = time.time()
        float(steps_k(state, st))
        best = min(best, time.time() - t0)
    return max((best - floor) / k, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the K-scan forward + train-step scan compile
    # for minutes on this few-core host; cache them so repeat bench runs
    # (and the driver's run) start hot.
    from lss2_multimodal_nu_tpu.utils.cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()

    def cache_entries() -> int:
        try:
            return len(os.listdir(cache_dir)) if cache_dir else -1
        except OSError:
            return 0

    cache_entries_start = cache_entries()

    from lss2_multimodal_nu_tpu.config import Config, ModelConfig
    from lss2_multimodal_nu_tpu.models.factory import build_model
    from __graft_entry__ import _fake_inputs

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    family = sys.argv[2] if len(sys.argv) > 2 else "vovnet_transformer"
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    # bf16 compute matches the reference's mixed-precision surface (fp16
    # autocast, train_vovnet_transformer.py:196-218); params stay f32 and the
    # sampling kernel computes in f32 regardless (selective policy)
    cfg = Config(
        model=ModelConfig(
            family=family, vovnet_type="vovnet39", lss_version="v2",
            effnet_variant="b4", compute_dtype=dtype,
        )
    )
    model = build_model(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), *_fake_inputs(b=batch, seed=0)
    )

    floor = measure_floor(jax, jnp)
    per, compile_s = bench_forward(jax, jnp, model, variables, batch, floor=floor)
    fps = batch / per

    headline = {
        "metric": "6cam_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 27.5, 3),
    }
    # The driver must always see a parseable result, even if it kills the
    # process mid-extras — print (and flush) the headline NOW.
    print(json.dumps(headline), flush=True)

    # Cache telemetry (VERDICT r4 item 1d): compile-vs-run time plus cache
    # entry deltas prove cold/warm start from the artifact itself. The
    # driver's r4 run compiled this step for ~26 min where a warm run takes
    # ~1 s — `headline_compile_s` makes that diagnosis one field.
    extras = {
        "call_floor_ms": round(floor * 1e3, 1),
        "headline_compile_s": round(compile_s, 1),
        "cache_entries_start": cache_entries_start,
        "cache_entries_now": cache_entries(),
        "cache_cold_start": compile_s > 30.0,
    }
    skipped = []

    def flush():
        out = dict(extras)
        if skipped:
            out["skipped"] = skipped
        out["bench_wall_s"] = round(time.time() - _T0, 1)
        out["cache_entries_now"] = cache_entries()
        # reprint the FULL enriched line after every completed extra: the
        # driver parses the process tail, so each reprint monotonically
        # upgrades the record even if the run is killed mid-extras
        print(json.dumps({**headline, **out}), flush=True)

    def run_extra(name, min_secs, fn):
        """Run `fn` only if the extras budget has at least min_secs left.
        min_secs assume WARM caches; a cold extra may overshoot — tolerated,
        see the _BUDGET note at the top."""
        if _remaining() < min_secs:
            skipped.append(name)
            return
        try:
            fn()
        except Exception as e:
            extras[f"{name}_error"] = f"{type(e).__name__}: {e}"[:120]
        flush()

    def do_stages():
        extras["stage_ms"] = bench_stages(jax, jnp, model, variables, batch)

    def do_train():
        tstep = bench_train_step(jax, jnp, cfg, model, batch=2, floor=floor)
        extras["train_step_b2_ms"] = round(tstep * 1e3, 1)
        extras["train_steps_per_sec_b2"] = round(1.0 / tstep, 2)

    def do_mfu():
        gflops, mfu = estimate_mfu(
            jax, model, variables, _fake_inputs(b=batch, seed=0), per
        )
        if mfu is not None:
            extras["xla_gflops_per_batch"] = gflops
            extras["mfu_pct_xla_est"] = mfu

    def do_bevtxt():
        # also record the published paper model (no GPU claim exists for it;
        # vs the same 27.5 FPS midpoint for scale — see PERF.md)
        cfg_bt = Config(
            model=ModelConfig(
                family="bev_txt", vovnet_type="vovnet39", lss_version="v2",
                effnet_variant="b4", compute_dtype=dtype,
            )
        )
        model_bt = build_model(cfg_bt)
        vars_bt = jax.jit(model_bt.init)(
            jax.random.PRNGKey(0), *_fake_inputs(b=batch, seed=0)
        )
        per_bt, bt_compile_s = bench_forward(
            jax, jnp, model_bt, vars_bt, batch, floor=floor
        )
        extras["bevtxt_frames_per_sec"] = round(batch / per_bt, 2)
        extras["bevtxt_vs_claim"] = round(batch / per_bt / 27.5, 2)
        extras["bevtxt_compile_s"] = round(bt_compile_s, 1)
        # the 27.5 FPS claim is for the FLAGSHIP; no GPU number exists for
        # BevTxt — same midpoint used for scale only (PERF.md fn 1)
        extras["bevtxt_vs_claim_note"] = (
            "flagship claim used for scale; no GPU baseline exists for bev_txt"
        )

    # Ordered by value-per-second for the official record (VERDICT r4 item
    # 1b): train step first, then BevTxt (the >=10x north-star evidence),
    # then the stage split; the mfu estimate is the cheapest AND least
    # informative (gather-bound model), so it goes last.
    run_extra("train_step", 90, do_train)
    if family == "vovnet_transformer":  # companion record, flagship runs only
        run_extra("bevtxt", 75, do_bevtxt)
    run_extra("stage_ms", 90, do_stages)
    run_extra("mfu", 45, do_mfu)
    flush()


if __name__ == "__main__":
    main()
