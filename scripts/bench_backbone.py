"""Per-stage micro-benchmark of the flagship backbone (VoVNet39, 36 images
of 128x352): where does the ~5 ms vs 2.3 ms-SOL slack live?

Times each stem conv / OSA stage in isolation (inference BN) with analytic
FLOPs and MXU efficiency, plus the full backbone for cross-checking, and
A/B variants of the hot stage (no-eSE, convs-only, ...) to localize slack.

Timing: slope method — each piece runs K and 3K times inside one jit
(lax.map over stacked varying inputs); ms = (T(3K) - T(K)) / 2K, so the
~28 ms axon call floor cancels exactly instead of being subtracted with
+-3 ms run-to-run jitter (which swamps sub-ms stages).

Usage: python scripts/bench_backbone.py [batch(imgs)=36] [dtype]
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
    K, M = 16, 5

    def timed(name, fn, *xs, flops=None, k=K):
        # one stacked input of 3k items; the k-run maps over the first k
        st = tuple(
            jnp.stack([x + jnp.asarray(1e-3 * (i % 7), x.dtype) for i in range(3 * k)])
            for x in xs
        )

        def mk_run(n):
            @jax.jit
            def run(st):
                def one(t):
                    out = fn(*t)
                    return sum(
                        jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)
                    )

                return jnp.sum(jax.lax.map(one, tuple(s[:n] for s in st)))

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
        ms = max(best_3k - best_k, 0.0) / (2 * k) * 1e3
        # free the stacked inputs before the next piece allocates its own
        # (several GB each at backbone shapes), and drop the jit executables
        # whose cached donated/temp buffers otherwise accumulate in HBM
        del st
        import gc

        gc.collect()
        eff = (
            f"  eff={flops / (ms * 1e-3) / 197e12 * 100:5.1f}%"
            if flops and ms > 0
            else ""
        )
        print(f"{name:46s} {ms:8.3f} ms{eff}", flush=True)
        return ms

    import flax.linen as nn

    from lss2_multimodal_nu_tpu.nn.layers import ConvBN, max_pool_ceil
    from lss2_multimodal_nu_tpu.nn.vovnet import ESEModule, OSABlock, VoVNetV2

    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(cdt)

    def conv_gf(n, hw, k, cin, cout):
        return n * hw * k * cin * cout * 2

    def bench_module(name, m, x, flops=None, k=K, train=False):
        v = jax.jit(lambda key, t: m.init(key, t, train))(jax.random.PRNGKey(0), x[:1])
        return timed(name, lambda t: m.apply(v, t, train), x, flops=flops, k=k)

    # ---- full backbone ----
    bb = VoVNetV2("vovnet39", dtype=cdt)
    bench_module(
        "FULL VoVNet39 (36 imgs)", bb, mk((imgs, 128, 352, 3)),
        flops=458e9 * imgs / 36, k=8,
    )

    # ---- stem ----
    for cin, cout, s, hw_in in (
        (3, 64, 2, (128, 352)),
        (64, 64, 1, (64, 176)),
        (64, 128, 2, (64, 176)),
    ):
        hw_out = (hw_in[0] // s) * (hw_in[1] // s)
        bench_module(
            f"stem {cin}->{cout} s{s} @{hw_in[0]}x{hw_in[1]}",
            ConvBN(cout, (3, 3), strides=(s, s), dtype=cdt),
            mk((imgs, hw_in[0], hw_in[1], cin)),
            flops=conv_gf(imgs, hw_out, 9, cin, cout),
        )

    # ---- OSA stages at flagship shapes ----
    # (name, in_ch, mid, out, blocks, H, W)
    stages = [
        ("stage1", 128, 128, 256, 1, 32, 88),
        ("stage2", 256, 160, 512, 1, 16, 44),
        ("stage3", 512, 192, 768, 2, 8, 22),
        ("stage4", 768, 224, 1024, 2, 4, 11),
    ]
    for name, cin, mid, out, blocks, h, w in stages:
        x = mk((imgs, h, w, cin))

        class _Stage(nn.Module):
            blocks: int
            cin: int
            mid: int
            out: int
            prefix: str

            @nn.compact
            def __call__(self, t, train=False):
                for b in range(self.blocks):
                    t = OSABlock(self.mid, self.out, residual=b > 0, dtype=cdt,
                                 name=f"{self.prefix}_b{b}")(t, train)
                return t

        hw = h * w
        gf, ci = 0, cin
        for b in range(blocks):
            gf += conv_gf(imgs, hw, 9, ci, mid)
            gf += 4 * conv_gf(imgs, hw, 9, mid, mid)
            gf += conv_gf(imgs, hw, 1, ci + 5 * mid, out)
            ci = out
        bench_module(
            f"{name} x{blocks} ({mid}/{out}) @{h}x{w}",
            _Stage(blocks, cin, mid, out, name), x, flops=gf,
        )

    # ---- stage1 A/B variants: where do its ~2 ms go? ----
    h, w, cin, mid, out = 32, 88, 128, 128, 256
    hw = h * w
    x = mk((imgs, h, w, cin))
    gf_convs = conv_gf(imgs, hw, 9, cin, mid) + 4 * conv_gf(imgs, hw, 9, mid, mid)
    gf_cat = conv_gf(imgs, hw, 1, cin + 5 * mid, out)

    class _Convs5(nn.Module):
        use_bn: bool = True

        @nn.compact
        def __call__(self, t, train=False):
            for i in range(5):
                t = ConvBN(mid, (3, 3), dtype=cdt, use_bn=self.use_bn,
                           name=f"c{i}")(t, train)
            return t

    class _NoESE(nn.Module):
        @nn.compact
        def __call__(self, t, train=False):
            outs = [t]
            for i in range(5):
                t = ConvBN(mid, (3, 3), dtype=cdt, name=f"c{i}")(t, train)
                outs.append(t)
            return ConvBN(out, (1, 1), dtype=cdt, name="cat")(outs, train)

    class _ESE(nn.Module):
        @nn.compact
        def __call__(self, t, train=False):
            return ESEModule(dtype=cdt)(t)

    bench_module("  s1: 5x conv3x3 chain (BN+relu)", _Convs5(), x, flops=gf_convs)
    bench_module("  s1: 5x conv3x3 chain (no BN)", _Convs5(False), x, flops=gf_convs)
    bench_module("  s1: convs + concat1x1 (no eSE)", _NoESE(), x,
                 flops=gf_convs + gf_cat)
    bench_module("  s1: eSE alone @256ch", _ESE(), mk((imgs, h, w, out)))
    bench_module(
        "  s1: single conv3x3 128->128", ConvBN(mid, (3, 3), dtype=cdt), x,
        flops=conv_gf(imgs, hw, 9, cin, mid), k=32,
    )

    # ---- concat-vs-split 1x1 A/B at every stage's aggregation shape ----
    class _CatConv(nn.Module):
        """materialized concat + plain 1x1 nn.Conv"""
        out: int
        nbr: int
        ch: tuple

        @nn.compact
        def __call__(self, ts, train=False):
            t = jnp.concatenate(list(ts), axis=-1)
            return ConvBN(self.out, (1, 1), dtype=cdt, name="cat")(t, train)

    class _SplitConv(nn.Module):
        out: int
        nbr: int
        ch: tuple

        @nn.compact
        def __call__(self, ts, train=False):
            return ConvBN(self.out, (1, 1), dtype=cdt, name="cat")(list(ts), train)

    for name, cin, mid, out, _, h, w in stages:
        branches = (cin,) + (mid,) * 5
        xs = tuple(mk((imgs, h, w, c)) for c in branches)
        gf = conv_gf(imgs, h * w, 1, sum(branches), out)
        for label, cls in (("concat", _CatConv), ("split", _SplitConv)):
            m = cls(out, len(branches), branches)
            v = jax.jit(lambda key, ts: m.init(key, ts, False))(
                jax.random.PRNGKey(0), tuple(t[:1] for t in xs)
            )
            timed(f"  {name} 1x1 {label} ({sum(branches)}->{out}) @{h}x{w}",
                  lambda *ts: m.apply(v, ts, False), *xs, flops=gf)
    class _Pool(nn.Module):
        @nn.compact
        def __call__(self, t, train=False):
            return max_pool_ceil(t, (3, 3), (2, 2), ceil_mode=True)

    bench_module("maxpool3x3s2 ceil @32x88x256", _Pool(),
                 mk((imgs, 32, 88, 256)), k=32)


if __name__ == "__main__":
    main()
