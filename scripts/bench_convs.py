"""Micro-benchmark of the flagship's non-sampling conv stages in isolation:
seg head convs, backbone, compress — to find XLA conv inefficiency.

Usage: python scripts/bench_convs.py [batch] [dtype]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from bench import measure_floor

    from lss2_multimodal_nu_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    floor = measure_floor(jax, jnp)
    print(f"call floor: {floor*1e3:.1f} ms")
    K, M = 6, 3

    def timed(name, fn, *xs, flops=None):
        st = tuple(
            jnp.stack([x + jnp.asarray(1e-3 * i, x.dtype) for i in range(K)])
            for x in xs
        )

        @jax.jit
        def run(st):
            def one(t):
                out = fn(*t)
                return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out))

            return jnp.sum(jax.lax.map(one, st))

        st = jax.block_until_ready(st)
        float(run(st))
        best = float("inf")
        for _ in range(M):
            t0 = time.time()
            float(run(st))
            best = min(best, time.time() - t0)
        ms = max(best - floor, 0.0) / K * 1e3
        eff = f"  eff={flops / (ms * 1e-3) / 197e12 * 100:5.1f}%" if flops else ""
        print(f"{name:44s} {ms:8.2f} ms{eff}")
        return ms

    rng = np.random.default_rng(0)
    refined = jnp.asarray(rng.normal(size=(batch, 200, 200, 256)).astype(np.float32)).astype(cdt)

    def gflops_conv(b, hw, kk, cin, cout):
        return b * hw * kk * cin * cout * 2

    # raw conv, no BN
    conv0 = nn.Conv(128, (3, 3), dtype=cdt)
    v0 = jax.jit(conv0.init)(jax.random.PRNGKey(0), refined[:1])
    timed("nn.Conv 256->128 3x3 @200x200", lambda x: conv0.apply(v0, x),
          refined, flops=gflops_conv(batch, 4e4, 9, 256, 128))

    # ConvBN as used by the seg head
    from lss2_multimodal_nu_tpu.nn.layers import ConvBN

    cbn = ConvBN(128, (3, 3), use_bias=True, dtype=cdt)
    v1 = jax.jit(lambda k, x: cbn.init(k, x, False))(jax.random.PRNGKey(0), refined[:1])
    timed("ConvBN 256->128 3x3 @200x200", lambda x: cbn.apply(v1, x, False),
          refined, flops=gflops_conv(batch, 4e4, 9, 256, 128))

    # full seg head
    y1 = jnp.asarray(rng.normal(size=(batch, 200, 200, 128)).astype(np.float32)).astype(cdt)
    cbn1 = ConvBN(64, (3, 3), use_bias=True, dtype=cdt)
    v2 = jax.jit(lambda k, x: cbn1.init(k, x, False))(jax.random.PRNGKey(0), y1[:1])
    timed("ConvBN 128->64 3x3 @200x200", lambda x: cbn1.apply(v2, x, False),
          y1, flops=gflops_conv(batch, 4e4, 9, 128, 64))

    y2 = jnp.asarray(rng.normal(size=(batch, 200, 200, 64)).astype(np.float32)).astype(cdt)
    c1x1 = nn.Conv(4, (1, 1), dtype=cdt)
    v3 = jax.jit(c1x1.init)(jax.random.PRNGKey(0), y2[:1])
    timed("nn.Conv 64->4 1x1 @200x200", lambda x: c1x1.apply(v3, x),
          y2, flops=gflops_conv(batch, 4e4, 1, 64, 4))

    # conv as explicit matmul (im2col-free 1x1-equivalent test): 3x3 via
    # lax.conv_general_dilated with NHWC
    w = jnp.asarray(rng.normal(size=(3, 3, 256, 128)).astype(np.float32)).astype(cdt) * 0.01

    def rawconv(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    timed("lax.conv 256->128 3x3 (pref f32)", rawconv,
          refined, flops=gflops_conv(batch, 4e4, 9, 256, 128))

    def rawconv_bf(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    timed("lax.conv 256->128 3x3 (native acc)", rawconv_bf,
          refined, flops=gflops_conv(batch, 4e4, 9, 256, 128))

    # matmul reference point: same FLOPs as seg0 in one dense dot
    a = jnp.asarray(rng.normal(size=(40000, 2304)).astype(np.float32)).astype(cdt)
    wm = jnp.asarray(rng.normal(size=(2304, 128)).astype(np.float32)).astype(cdt) * 0.01
    timed("dense (40k,2304)@(2304,128)", lambda x: x @ wm, a,
          flops=4e4 * 2304 * 128 * 2)


if __name__ == "__main__":
    main()
