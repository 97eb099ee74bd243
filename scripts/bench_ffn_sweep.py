"""Sweep the fused-FFN kernel's row-block (_QN) and hidden-chunk (_FCHUNK)
knobs at flagship shapes (round-4 tuning pass; the shipped values win or
tie). Usage: python scripts/bench_ffn_sweep.py [batch] [dtype]
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

    from lss2_multimodal_nu_tpu.ops import ffn_pallas

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    b, n, c, f = batch, 40000, 256, 1024

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32)).astype(cdt)
    w1 = jnp.asarray(rng.normal(0, 0.02, (c, f)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.02, (f,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.02, (f, c)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.02, (c,)).astype(np.float32))
    s1 = jnp.ones((c,), np.float32)
    o1 = jnp.zeros((c,), np.float32)
    s2 = jnp.ones((c,), np.float32)
    o2 = jnp.zeros((c,), np.float32)

    K, M = 6, 4
    floor = measure_floor(jax, jnp)
    su = jax.block_until_ready(
        jnp.stack([u + jnp.asarray(1e-3 * i, u.dtype) for i in range(K)])
    )

    def bench(qn, fchunk):
        ffn_pallas._QN = qn
        ffn_pallas._FCHUNK = fchunk

        @jax.jit
        def run(su_):
            def one(u_):
                out = ffn_pallas.fused_ffn_ln(
                    u_, w1, b1, w2, b2, s1, o1, s2, o2, compute_dtype=cdt
                )
                return jnp.sum(out.astype(jnp.float32))

            return jnp.sum(jax.lax.map(one, su_))

        try:
            float(run(su))
        except Exception as e:
            print(f"QN={qn:5d} FCHUNK={fchunk:4d}: FAIL {type(e).__name__}: {e}"[:110],
                  flush=True)
            return
        best = float("inf")
        for _ in range(M):
            t0 = time.time()
            float(run(su))
            best = min(best, time.time() - t0)
        ms = max(best - floor, 0.0) / K * 1e3
        print(f"QN={qn:5d} FCHUNK={fchunk:4d}: {ms:6.2f} ms/batch", flush=True)

    for qn in (960, 2000, 3200):
        for fchunk in (64, 128, 256):
            bench(qn, fchunk)


if __name__ == "__main__":
    main()
