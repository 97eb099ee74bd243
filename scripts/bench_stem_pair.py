"""Image-pairing A/B for the VoVNet stem's 64-channel convs.

scripts/bench_backbone.py shows 128-channel 3x3 convs run at ~80% MXU
efficiency while the stem's 64-channel convs run at ~20%: half the MXU
lanes idle on cout=64 and XLA's chosen strategy degrades further. Pairing
two images channel-wise ((2B, H, W, 64) -> (B, H, W, 128)) with a
block-diagonal kernel ((3,3,128,128), zero off-diagonal blocks) restores
full lane occupancy at the cost of 2x padded MACs — net win iff the
64-channel path is more than 2x below the 128-channel rate.

Usage: python scripts/bench_stem_pair.py [imgs=36] [dtype]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from lss2_multimodal_nu_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    imgs = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    K, M = 12, 5
    rng = np.random.default_rng(0)

    def timed(name, fn, x, flops=None, k=K):
        xh = np.asarray(x.astype(jnp.float32))
        st = jnp.asarray(
            np.stack([xh + 1e-3 * (i % 7) for i in range(3 * k)])
        ).astype(x.dtype)

        def mk_run(n):
            @jax.jit
            def run(st):
                return jnp.sum(
                    jax.lax.map(lambda t: jnp.sum(fn(t).astype(jnp.float32)), st[:n])
                )

            return run

        run_k, run_3k = mk_run(k), mk_run(3 * k)
        st = jax.block_until_ready(st)
        float(run_k(st)), float(run_3k(st))
        best_k = best_3k = float("inf")
        for _ in range(M):
            t0 = time.time()
            float(run_k(st))
            best_k = min(best_k, time.time() - t0)
            t0 = time.time()
            float(run_3k(st))
            best_3k = min(best_3k, time.time() - t0)
        del st
        ms = max(best_3k - best_k, 0.0) / (2 * k) * 1e3
        eff = (
            f"  eff={flops / (ms * 1e-3) / 197e12 * 100:5.1f}%"
            if flops and ms > 0
            else ""
        )
        print(f"{name:46s} {ms:8.3f} ms{eff}", flush=True)
        return ms

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(cdt)

    def conv(x, w, stride):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def pair(x, cin):
        b = x.shape[0]
        return jnp.concatenate([x[: b // 2], x[b // 2 :]], axis=-1)

    def unpair(y, cout):
        return jnp.concatenate([y[..., :cout], y[..., cout:]], axis=0)

    def blockdiag(w, cin, cout):
        wb = np.zeros((3, 3, 2 * cin, 2 * cout), np.float32)
        wn = np.asarray(w, np.float32)
        wb[:, :, :cin, :cout] = wn
        wb[:, :, cin:, cout:] = wn
        return jnp.asarray(wb)

    for label, cin, cout, stride, hw in (
        ("stem1 64->64 s1", 64, 64, 1, (64, 176)),
        ("stem2 64->128 s2", 64, 128, 2, (64, 176)),
    ):
        x = mk((imgs, hw[0], hw[1], cin))
        w = mk((3, 3, cin, cout)) * 0.05
        wb = blockdiag(w, cin, cout)
        gf = imgs * (hw[0] // stride) * (hw[1] // stride) * 9 * cin * cout * 2
        ref = conv(x, w, stride)
        alt = unpair(conv(pair(x, cin), wb, stride), cout)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32))))
        print(f"{label} pair max|err| = {err:.4f}")
        timed(f"{label}: xla", lambda t, w=w, s=stride: conv(t, w, s), x, flops=gf)
        timed(
            f"{label}: paired",
            lambda t, wb=wb, s=stride, ci=cin, co=cout: unpair(
                conv(pair(t, ci), wb, s), co
            ),
            x, flops=gf,
        )
        # paired without the pack/unpack layout ops (steady-state bound:
        # if the stem chain stays paired end-to-end, pack/unpack happen once)
        xp = mk((imgs // 2, hw[0], hw[1], 2 * cin))
        timed(
            f"{label}: paired core only",
            lambda t, wb=wb, s=stride: conv(t, wb, s), xp, flops=gf,
        )

    # stem0 3->64 s2: pair to 6 input channels, 128 output lanes
    x = mk((imgs, 128, 352, 3))
    w = mk((3, 3, 3, 64)) * 0.1
    wb = blockdiag(w, 3, 64)
    gf = imgs * 64 * 176 * 9 * 3 * 64 * 2
    ref = conv(x, w, 2)
    alt = unpair(conv(pair(x, 3), wb, 2), 64)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32))))
    print(f"stem0 pair max|err| = {err:.4f}")
    timed("stem0 3->64 s2: xla", lambda t: conv(t, w, 2), x, flops=gf)
    timed("stem0 3->64 s2: paired", lambda t: unpair(conv(pair(t, 3), wb, 2), 64),
          x, flops=gf)


if __name__ == "__main__":
    main()
