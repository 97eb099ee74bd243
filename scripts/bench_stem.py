"""A/B the VoVNet stem convs (36 imgs, 128x352 -> stride 4), which run at
2-21% MXU efficiency under plain XLA convs (scripts/bench_backbone.py):

  stem0  3->64  s2 @128x352   cin=3: contraction 27, heavily MXU-padded
  stem1 64->64  s1 @64x176    cout=64: half the MXU lanes idle
  stem2 64->128 s2 @64x176

Variants measured per conv:
  xla      — nn.Conv as deployed (ConvBN without BN/act to isolate)
  s2d      — space-to-depth by the stride (stride-2 convs): conv3x3/s2 ==
             conv2x2/s1 on the 2x2-block-reshaped input, kernel zero-padded
             27->48 taps (classic MLPerf-ResNet stem trick)
  wpair    — width-pair space-to-depth for the stride-1 conv: pairs of
             adjacent columns become one 128-lane row; the 3x3x64->64 conv
             becomes 3x3x128->128 with a 50%-sparse (zeroed) kernel, full
             MXU lanes both sides
Equality vs the xla path is asserted to 1e-2 (bf16) before timing.

Usage: python scripts/bench_stem.py [imgs=36] [dtype]
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
        # stack on host: jnp.stack of 3k device arrays can pick a batch-minor
        # layout with 8x tile padding (observed 38 GB OOM at stem shapes)
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
        print(f"{name:44s} {ms:8.3f} ms{eff}", flush=True)
        return ms

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(cdt)

    def conv_ref(x, w, stride):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def s2d_conv(x, w, cin, cout):
        """conv3x3/s2 via 2x2 space-to-depth: pad so taps align, reshape to
        (H/2, W/2, 4*cin), conv2x2/s1 with the retapped kernel."""
        n, h, ww, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # now taps start at 0
        # blocks of 2: input row r -> block r//2, slot r%2
        xb = xp.reshape(n, (h + 2) // 2, 2, (ww + 2) // 2, 2, cin)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, (h + 2) // 2, (ww + 2) // 2, 4 * cin
        )
        # retap: output (y,x) needs padded rows 2y..2y+2 = block y slots 0,1 +
        # block y+1 slot 0 -> kernel 2x2 blocks, zero where slot unused
        w2 = np.zeros((2, 2, 2, 2, cin, cout), np.float32)  # (bh,bw,sh,sw,ci,co)
        wn = np.asarray(w, np.float32)
        for ty in range(3):
            for tx in range(3):
                w2[ty // 2, tx // 2, ty % 2, tx % 2] = wn[ty, tx]
        # block channel layout is (sh, sw, ci) — matches (bh,bw,sh,sw,ci,co)
        w2 = jnp.asarray(w2.reshape(2, 2, 4 * cin, cout))
        return jax.lax.conv_general_dilated(
            xb, w2.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def wpair_conv(x, w, cin, cout):
        """stride-1 3x3 conv as 3x3 over W-paired 2*cin channels -> 2*cout."""
        n, h, ww, _ = x.shape
        xb = x.reshape(n, h, ww // 2, 2 * cin)
        # out pair X (cols 2X,2X+1): needs cols 2X-1..2X+2 -> wblocks X-1,X,X+1
        w2 = np.zeros((3, 3, 2, cin, 2, cout), np.float32)  # (th,twb,si,ci,so,co)
        wn = np.asarray(w, np.float32)
        for ty in range(3):
            for so in range(2):  # output column parity within the pair
                for tx in range(3):  # original tap: input col = 2X+so+tx-1
                    col = so + tx - 1  # relative to block 2X: block (col//2)+? ...
                    wb, si = (col // 2) + 1, col % 2  # +1: blocks X-1,X,X+1 -> 0,1,2
                    w2[ty, wb, si, :, so, :] += wn[ty, tx]
        w2 = jnp.asarray(w2.reshape(3, 3, 2 * cin, 2 * cout))
        yb = jax.lax.conv_general_dilated(
            xb, w2.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return yb.reshape(n, h, ww, cout)

    # ---- stem0: 3->64 s2 @128x352 ----
    x0 = mk((imgs, 128, 352, 3))
    w0 = mk((3, 3, 3, 64)) * 0.1
    gf0 = imgs * 64 * 176 * 9 * 3 * 64 * 2
    ref = conv_ref(x0, w0, 2)
    alt = s2d_conv(x0, w0, 3, 64)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32))))
    print(f"stem0 s2d max|err| = {err:.4f}")
    timed("stem0 3->64 s2: xla", lambda t: conv_ref(t, w0, 2), x0, flops=gf0)
    timed("stem0 3->64 s2: s2d", lambda t: s2d_conv(t, w0, 3, 64), x0, flops=gf0)

    # ---- stem1: 64->64 s1 @64x176 ----
    x1 = mk((imgs, 64, 176, 64))
    w1 = mk((3, 3, 64, 64)) * 0.05
    gf1 = imgs * 64 * 176 * 9 * 64 * 64 * 2
    ref = conv_ref(x1, w1, 1)
    alt = wpair_conv(x1, w1, 64, 64)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32))))
    print(f"stem1 wpair max|err| = {err:.4f}")
    timed("stem1 64->64 s1: xla", lambda t: conv_ref(t, w1, 1), x1, flops=gf1)
    timed("stem1 64->64 s1: wpair", lambda t: wpair_conv(t, w1, 64, 64), x1, flops=gf1)

    def im2col_conv(x, w, cin, cout, stride=1):
        """3x3 conv as materialized patch rows + ONE fully-MXU-packed matmul
        (rows, 9*cin) @ (9*cin, cout): 576-deep contraction packs the MXU
        contraction dim completely (r5 'layout' experiment; the cost is the
        9x input re-read the concat materializes)."""
        n, h, ww, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        oh, ow = h // stride, ww // stride
        cols = [
            xp[:, dy : dy + h : stride, dx : dx + ww : stride, :]
            for dy in range(3)
            for dx in range(3)
        ]
        xi = jnp.concatenate(cols, axis=-1)  # (n, oh, ow, 9*cin), tap-major
        wm = w.reshape(9 * cin, cout)  # HWIO flatten == tap-major channel-minor
        y = jax.lax.dot_general(
            xi.reshape(n * oh * ow, 9 * cin), wm.astype(x.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return y.reshape(n, oh, ow, cout).astype(x.dtype)

    alt = im2col_conv(x1, w1, 64, 64)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32))))
    print(f"stem1 im2col max|err| = {err:.4f}")
    timed("stem1 64->64 s1: im2col", lambda t: im2col_conv(t, w1, 64, 64), x1, flops=gf1)

    # ---- stem2: 64->128 s2 @64x176 ----
    x2 = mk((imgs, 64, 176, 64))
    w2 = mk((3, 3, 64, 128)) * 0.05
    gf2 = imgs * 32 * 88 * 9 * 64 * 128 * 2
    ref = conv_ref(x2, w2, 2)
    alt = s2d_conv(x2, w2, 64, 128)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32))))
    print(f"stem2 s2d max|err| = {err:.4f}")
    alt = im2col_conv(x2, w2, 64, 128, stride=2)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32))))
    print(f"stem2 im2col max|err| = {err:.4f}")
    timed("stem2 64->128 s2: xla", lambda t: conv_ref(t, w2, 2), x2, flops=gf2)
    timed("stem2 64->128 s2: s2d", lambda t: s2d_conv(t, w2, 64, 128), x2, flops=gf2)
    timed("stem2 64->128 s2: im2col", lambda t: im2col_conv(t, w2, 64, 128, 2), x2, flops=gf2)


if __name__ == "__main__":
    main()
