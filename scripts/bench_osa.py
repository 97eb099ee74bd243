"""A/B the VoVNet OSA block's aggregation pattern at flagship backbone
shapes: XLA's concat -> 1x1 conv vs an algebraically identical split form
(sum of per-branch matmuls, no materialized concat), per stage.

Usage: python scripts/bench_osa.py [dtype]
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

    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    floor = measure_floor(jax, jnp)
    print(f"call floor: {floor*1e3:.1f} ms")
    # These stage graphs are sub-ms: use a long scan for SNR, and vary the
    # input per REPEAT too — the axon terminal result-caches small repeated
    # identical calls (first observed here: repeats collapsed to the floor,
    # "eff" > 800%), so every call must be a fresh (executable, args) pair.
    K, M = 24, 3
    BN = 36  # B=6 x 6 cams

    def timed(name, fn, *xs, flops=None):
        st = tuple(
            jnp.stack([x + jnp.asarray(1e-3 * i, x.dtype) for i in range(K)])
            for x in xs
        )

        @jax.jit
        def run(rep, st):
            def one(t):
                out = fn(*(t[:-1]))
                return sum(
                    jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)
                ) + t[-1]

            reps = jnp.full((K,), rep, jnp.float32)
            return jnp.sum(jax.lax.map(one, (*st, reps)))

        st = jax.block_until_ready(st)
        float(run(jnp.float32(0), st))
        best = float("inf")
        for m in range(M):
            t0 = time.time()
            float(run(jnp.float32(m + 1), st))
            best = min(best, time.time() - t0)
        ms = max(best - floor, 0.0) / K * 1e3
        eff = (
            f"  eff={flops / (max(ms, 1e-9) * 1e-3) / 197e12 * 100:5.1f}%"
            if flops
            else ""
        )
        print(f"{name:46s} {ms:8.2f} ms{eff}")
        return ms

    rng = np.random.default_rng(0)
    # (stage, h, w, in_ch, mid_ch, out_ch) — timm ese_vovnet39b at 128x352
    stages = [
        (1, 32, 88, 128, 128, 256),
        (2, 16, 44, 256, 160, 512),
        (3, 8, 22, 512, 192, 768),
        (4, 4, 11, 768, 224, 1024),
    ]
    layers = 5
    for (si, h, w, cin, mid, cout) in stages:
        x = jnp.asarray(
            rng.normal(size=(BN, h, w, cin)).astype(np.float32)
        ).astype(cdt)
        ws = []
        c = cin
        for i in range(layers):
            ws.append(
                jnp.asarray(
                    (rng.normal(size=(3, 3, c, mid)) * 0.05).astype(np.float32)
                ).astype(cdt)
            )
            c = mid
        wcat = jnp.asarray(
            (rng.normal(size=(cin + layers * mid, cout)) * 0.05).astype(np.float32)
        ).astype(cdt)

        def convs(x):
            outs = [x]
            for wk in ws:
                x = jax.lax.conv_general_dilated(
                    x, wk, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                x = jax.nn.relu(x)
                outs.append(x)
            return outs

        def osa_concat(x):
            outs = convs(x)
            cat = jnp.concatenate(outs, axis=-1)
            return cat @ wcat

        def osa_split(x):
            outs = convs(x)
            off = 0
            acc = None
            for o in outs:
                c = o.shape[-1]
                y = o @ wcat[off : off + c]
                off += c
                acc = y if acc is None else acc + y
            return acc

        fl_convs = (
            BN * h * w * 9 * (cin * mid + (layers - 1) * mid * mid) * 2
        )
        fl_cat = BN * h * w * (cin + layers * mid) * cout * 2
        t_cat = timed(
            f"stage{si} OSA concat->1x1   {h}x{w}", osa_concat, x,
            flops=fl_convs + fl_cat,
        )
        t_split = timed(
            f"stage{si} OSA split-sum     {h}x{w}", osa_split, x,
            flops=fl_convs + fl_cat,
        )
        # numerical identity check (bf16: loose)
        a = jax.jit(osa_concat)(x)
        b = jax.jit(osa_split)(x)
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"  split == concat: max|d| = {d:.3e}   speedup {t_cat / t_split:5.2f}x")


if __name__ == "__main__":
    main()
