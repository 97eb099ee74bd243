"""A/B: _QGROUP sweep for the sampling kernel gather loop (real TPU)."""
import time

import jax
import jax.numpy as jnp

from lss2_multimodal_nu_tpu.ops import deformable_pallas as dp

BH, DH, H, W, NPTS = 48, 32, 200, 200, 8
N = H * W
DT = jnp.bfloat16

ks = jax.random.split(jax.random.PRNGKey(0), 8)
v = jax.random.normal(ks[0], (BH, DH, N), DT)
lx = jax.random.uniform(ks[1], (BH, NPTS, N))
ly = jax.random.uniform(ks[2], (BH, NPTS, N))
attn = jax.nn.softmax(jax.random.normal(ks[3], (BH, NPTS, N)), axis=1)
args = jax.block_until_ready((v, lx, ly, attn))


def floor_ms():
    xs = [jax.random.normal(jax.random.PRNGKey(s), (128, 128)) for s in range(9)]
    jax.block_until_ready(xs)
    f = jax.jit(lambda x: jnp.sum(x * 2.0))
    float(f(xs[0]))
    t0 = time.time()
    for i in range(1, 9):
        float(f(xs[i]))
    return (time.time() - t0) / 8


FLOOR = floor_ms()
print(f"floor {FLOOR*1e3:.1f} ms", flush=True)

base = None
for qg in (8, 16, 32):
    dp._QGROUP = qg

    @jax.jit
    def run_k(v, lx, ly, attn):
        def one(c, _):
            o = dp.deformable_sample_combine_pallas_xy_prefold(
                c, lx, ly, attn, H, W, False
            )
            bump = (1e-6 * jnp.mean(o.astype(jnp.float32))).astype(c.dtype)
            return c + bump, jnp.sum(o.astype(jnp.float32))
        c, ss = jax.lax.scan(one, v, None, length=4)
        return ss[0], jnp.sum(ss)

    try:
        t0 = time.time()
        s0 = float(run_k(*args)[0])
        ct = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(run_k(*args)[1])
            best = min(best, time.time() - t0)
        per = (best - FLOOR) / 4
        if base is None:
            base = s0
        match = "ok" if abs(s0 - base) <= 1e-3 * abs(base) else "MISMATCH"
        print(f"QGROUP={qg}: {per*1e3:.2f} ms/call (compile {ct:.0f}s, sum {match})", flush=True)
    except Exception as e:
        print(f"QGROUP={qg}: failed {type(e).__name__}: {str(e)[:100]}", flush=True)
dp._QGROUP = 8
