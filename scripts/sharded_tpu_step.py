"""Pallas-under-sharding evidence (round-2 VERDICT weak item 2): run the
FULL-SIZE flagship train step on the real TPU chip under an explicit
jax.sharding.Mesh (dp=1 on one chip — same pjit/sharding machinery a pod
uses, with XLA inserting no-op collectives), with ALL Pallas kernels active
(deformable fwd+bwd, fused lift+splat, FFN tail, seg head).

Verifies the composition pallas_call x jit-with-shardings on TPU that
tests/test_dist.py can only exercise on the CPU mesh (where kernels fall
back to XLA), and times it against the unsharded train step.

Usage: python scripts/sharded_tpu_step.py [batch] [dtype]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lss2_multimodal_nu_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from __graft_entry__ import _fake_inputs
    from bench import measure_floor
    from lss2_multimodal_nu_tpu.config import Config, MeshConfig, ModelConfig, TrainConfig
    from lss2_multimodal_nu_tpu.models.factory import build_model
    from lss2_multimodal_nu_tpu.parallel.mesh import (
        activate_mesh,
        make_mesh,
        shard_batch,
        shard_state,
    )
    from lss2_multimodal_nu_tpu.train.state import create_train_state
    from lss2_multimodal_nu_tpu.train.steps import make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    print("devices:", jax.devices())

    cfg = Config(
        model=ModelConfig(
            family="vovnet_transformer", vovnet_type="vovnet39",
            lss_version="v2", compute_dtype=dtype,
        ),
        train=TrainConfig(batch_size=batch, use_schedule=True,
                          max_grad_norm=10.0),
        mesh=MeshConfig(dp=1, fsdp=1),
    )
    model = build_model(cfg)
    inputs = _fake_inputs(b=batch, seed=0)
    rng = np.random.default_rng(0)
    batch_d = dict(
        zip(("imgs", "rots", "trans", "intrins", "post_rots", "post_trans"), inputs),
        binimg=jnp.asarray(rng.integers(0, 4, size=(batch, 200, 200))),
        act=jnp.asarray((rng.random((batch, 4)) < 0.4).astype(np.float32)),
        desc=jnp.asarray((rng.random((batch, 8)) < 0.4).astype(np.float32)),
    )
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        tuple(x[:1] for x in inputs), steps_per_epoch=100,
    )
    mesh = make_mesh(cfg)
    print("mesh:", dict(mesh.shape))
    activate_mesh(mesh)  # resolves constrain_batch hints in the models
    state = shard_state(mesh, state)
    batch_sh = shard_batch(mesh, batch_d)
    step = make_train_step(cfg, model)

    t0 = time.time()
    state, metrics = step(state, batch_sh, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    gn = float(metrics["grad_norm"])
    print(f"compile+first step: {time.time() - t0:.1f}s loss={loss:.4f} grad_norm={gn:.2f}")
    assert np.isfinite(loss) and np.isfinite(gn)
    # confirm the sharded-state arrays actually carry the mesh
    sh = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, state.params)
    )[0]
    print("param sharding:", sh)

    floor = measure_floor(jax, jnp)
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        state, metrics = step(state, batch_sh, jax.random.PRNGKey(2))
        float(metrics["loss"])  # force
        best = min(best, time.time() - t0)
    per = best - floor
    print(
        f"sharded train step (B={batch}, {dtype}, mesh dp=1, per-call): "
        f"{per * 1e3:.1f} ms  ({batch / per:.2f} steps-frames/s)"
    )

    # Scan-amortized timing with the SAME methodology as the unsharded
    # bench (bench.bench_train_step) so sharded-vs-unsharded is an
    # apples-to-apples comparison (per-call timing carries +-3 ms of
    # tunnel jitter even after floor subtraction).
    K, M = 3, 3
    batches = []
    for s in range(K):
        ins = _fake_inputs(b=batch, seed=s)
        bd = dict(
            zip(("imgs", "rots", "trans", "intrins", "post_rots", "post_trans"), ins),
            binimg=jnp.asarray(rng.integers(0, 4, size=(batch, 200, 200))),
            act=jnp.asarray((rng.random((batch, 4)) < 0.4).astype(np.float32)),
            desc=jnp.asarray((rng.random((batch, 8)) < 0.4).astype(np.float32)),
        )
        batches.append(shard_batch(mesh, bd))
    st = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    st = jax.block_until_ready(st)

    @jax.jit
    def steps_k(state0, st):
        def one(carry, b):
            s, _ = carry
            s2, m = step(s, b, jax.random.PRNGKey(0))
            return (s2, m["loss"]), ()

        (_, loss), _ = jax.lax.scan(one, (state0, jnp.float32(0)), st)
        return loss

    float(steps_k(state, st))
    best = float("inf")
    for _ in range(M):
        t0 = time.time()
        float(steps_k(state, st))
        best = min(best, time.time() - t0)
    per = max(best - floor, 1e-9) / K
    print(
        f"sharded train step (B={batch}, {dtype}, mesh dp=1, scan-amortized): "
        f"{per * 1e3:.1f} ms  ({batch / per:.2f} steps-frames/s)"
    )


if __name__ == "__main__":
    main()
