"""What the train step pays beyond fwd+bwd (VERDICT r4: close the 82.7 ms
@B=2 -> <=70 ms gap): A/Bs the full flagship train step with threefry vs
hardware-RNG ("rbg") dropout masks, and times the train-mode forward vs the
eval forward to bound the BN-stats + dropout forward overhead.

Scan-amortized, floor-subtracted (see bench.py methodology).

Usage: python scripts/profile_train_extras.py [batch] [dtype]
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

    import dataclasses

    from bench import bench_train_step, measure_floor
    from lss2_multimodal_nu_tpu.config import Config, ModelConfig, TrainConfig
    from lss2_multimodal_nu_tpu.models.factory import build_model
    from __graft_entry__ import _fake_inputs

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"

    def cfg_with(impl):
        return Config(
            model=ModelConfig(
                family="vovnet_transformer", vovnet_type="vovnet39",
                lss_version="v2", compute_dtype=dtype,
            ),
            train=TrainConfig(dropout_rng_impl=impl),
        )

    cfg = cfg_with("threefry")
    model = build_model(cfg)
    floor = measure_floor(jax, jnp)
    print(f"call floor: {floor*1e3:.1f} ms", flush=True)

    for impl in ("threefry", "rbg"):
        t = bench_train_step(jax, jnp, cfg_with(impl), model, batch=batch, floor=floor)
        print(f"train step B={batch} dropout_rng={impl:9s} {t*1e3:8.2f} ms", flush=True)

    # train-mode vs eval-mode forward (BN batch stats + dropout masks + the
    # un-fused FFN/seg-head paths vs the fused inference kernels)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *_fake_inputs(b=batch, seed=0))
    K, M = 4, 3
    sets = [_fake_inputs(b=batch, seed=s) for s in range(K)]
    st = tuple(jnp.stack([s[i] for s in sets]) for i in range(6))
    st = jax.block_until_ready(st)

    def timed(name, fn):
        @jax.jit
        def run(v, st):
            def one(t):
                out = fn(v, *t)
                return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out))

            return jnp.sum(jax.lax.map(one, st))

        float(run(variables, st))
        best = float("inf")
        for _ in range(M):
            t0 = time.time()
            float(run(variables, st))
            best = min(best, time.time() - t0)
        print(f"{name:44s} {max(best - floor, 0.0) / K * 1e3:8.2f} ms", flush=True)

    timed("forward eval-mode (fused kernels)", lambda v, *t: model.apply(v, *t))
    timed(
        "forward train-mode (BN+dropout, no fusion)",
        lambda v, *t: model.apply(
            v, *t, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0, impl="rbg")},
        )[0],
    )
    timed(
        "forward train-mode (threefry dropout)",
        lambda v, *t: model.apply(
            v, *t, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )[0],
    )


if __name__ == "__main__":
    main()
