"""Micro-benchmark for the deformable-sampling Pallas kernel alone.

Usage: python scripts/bench_sampling.py [batch] [dtype] [impl]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import measure_floor

    from lss2_multimodal_nu_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from lss2_multimodal_nu_tpu.ops import deformable_pallas
    from lss2_multimodal_nu_tpu.ops.deformable_sampling import (
        deformable_sample_combine_xy,
    )

    if os.environ.get("DEF_QGROUP"):
        deformable_pallas._QGROUP = int(os.environ["DEF_QGROUP"])
    if os.environ.get("DEF_TABLE_BF16"):
        deformable_pallas._TABLE_BF16 = True
    if os.environ.get("DEF_RMW"):  # force the RMW assembly fallback (A/B)
        deformable_pallas._SELECT_COMPOSE = False

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    impl = sys.argv[3] if len(sys.argv) > 3 else "pallas"
    npts = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    h = w = 200
    nq = h * w
    nh, dh = 8, 32
    b = batch

    rng = np.random.default_rng(0)
    v_cm = jnp.asarray(rng.normal(size=(b * nh, dh, nq)).astype(np.float32)).astype(cdt)
    locs_mode = os.environ.get("DEF_LOCS", "random")
    if locs_mode == "smooth":
        # raster reference + per-(bh, point) sub-pixel offsets: adjacent
        # queries sample adjacent pixels -> coalesced fast path (the shape
        # of a smooth trained offset field; also exactly the init field)
        ys, xs_ = np.meshgrid(
            np.linspace(0, 1, h, dtype=np.float32),
            np.linspace(0, 1, w, dtype=np.float32),
            indexing="ij",
        )
        offx = rng.uniform(-8, 8, (b * nh, npts, 1)).astype(np.float32) / h
        offy = rng.uniform(-8, 8, (b * nh, npts, 1)).astype(np.float32) / h
        lx = jnp.asarray(np.clip(xs_.reshape(1, 1, nq) + offx, 0.0, 1.0))
        ly = jnp.asarray(np.clip(ys.reshape(1, 1, nq) + offy, 0.0, 1.0))
    else:
        lx = jnp.asarray(rng.uniform(0, 1, (b * nh, npts, nq)).astype(np.float32))
        ly = jnp.asarray(rng.uniform(0, 1, (b * nh, npts, nq)).astype(np.float32))
    at = jnp.asarray(
        (rng.uniform(0.1, 1, (b * nh, npts, nq)) / npts).astype(np.float32)
    )

    K, M = 6, 4
    floor = measure_floor(jax, jnp)

    def stack(x):
        return jnp.stack([x + jnp.asarray(1e-3 * i, x.dtype) for i in range(K)])

    sv, slx, sly, sat = stack(v_cm), stack(lx), stack(ly), stack(at)

    grad_mode = os.environ.get("DEF_GRAD", "0") == "1"

    def fwd_sum(v_, lx_, ly_, at_):
        out = deformable_sample_combine_xy(
            v_, lx_, ly_, at_, h, w, impl=impl, prefold=True, keep_pad=True
        )
        # quadrant-replicated cotangent (the gradient contract): sum over a
        # replicated projection
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def run(args):
        def one(t):
            if grad_mode:
                val, grads = jax.value_and_grad(fwd_sum, argnums=(0, 1, 2, 3))(*t)
                return val + sum(jnp.sum(g.astype(jnp.float32)) for g in grads)
            return fwd_sum(*t)

        return jnp.sum(jax.lax.map(one, args))

    args = jax.block_until_ready((sv, slx, sly, sat))
    t0 = time.time()
    float(run(args))
    print(f"compile+first: {time.time()-t0:.1f} s")
    best = float("inf")
    for _ in range(M):
        t0 = time.time()
        float(run(args))
        best = min(best, time.time() - t0)
    ms = max(best - floor, 0.0) / K * 1e3
    rows = b * nh * npts * nq
    print(
        f"sampling[{impl}] B={batch} {dtype}: {ms:.2f} ms/batch "
        f"({rows/ms*1e3/1e6:.0f} M rows/s, {ms/batch:.2f} ms/frame)"
    )


if __name__ == "__main__":
    main()
