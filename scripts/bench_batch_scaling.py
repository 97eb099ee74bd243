"""Flagship forward throughput vs batch size (frames/s/chip).

The headline metric is 6-cam frames/sec/chip and the batch is ours to
choose; this sweep checks whether a larger batch amortizes the
non-sampling stages enough to move the headline (the sampling kernel is
strictly linear in B — its per-bh table build and gather loop both scale
with B*heads, so any gain must come from conv/matmul utilization).

Usage: python scripts/bench_batch_scaling.py [batches...] [--dtype bf16]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from lss2_multimodal_nu_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import bench_forward, measure_floor
    from __graft_entry__ import _fake_inputs
    from lss2_multimodal_nu_tpu.config import Config, ModelConfig
    from lss2_multimodal_nu_tpu.models.factory import build_model

    batches, dtype = [], "bfloat16"
    argv = iter(sys.argv[1:])
    for a in argv:
        if a == "--dtype":
            d = next(argv, None)
            if d is None:
                sys.exit("--dtype needs a value (bf16|f32)")
            dtype = {"bf16": "bfloat16", "f32": "float32"}.get(d, d)
        elif a.isdigit():
            batches.append(int(a))
        else:
            sys.exit(f"unrecognized argument: {a!r}")
    batches = batches or [6, 8, 12]
    cfg = Config(
        model=ModelConfig(
            family="vovnet_transformer", vovnet_type="vovnet39",
            lss_version="v2", compute_dtype=dtype,
        )
    )
    model = build_model(cfg)
    floor = measure_floor(jax, jnp)
    print(f"call floor: {floor * 1e3:.1f} ms")
    for b in batches:
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), *_fake_inputs(b=b, seed=0)
        )
        per = bench_forward(jax, jnp, model, variables, b, k=4, floor=floor)
        print(f"B={b:3d}: {per * 1e3:8.1f} ms/batch  {b / per:7.1f} frames/s/chip")


if __name__ == "__main__":
    main()
