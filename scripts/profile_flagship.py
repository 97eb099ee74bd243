"""Per-stage timing of the flagship forward on the real TPU chip.

Breaks VoVNetBEVTransformer.__call__ into its pipeline stages and times each
with the same floor-subtracted, scan-amortized methodology as bench.py, so the
stage times sum (approximately) to the end-to-end frame time.

Usage: python scripts/profile_flagship.py [batch] [dtype]
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
    from lss2_multimodal_nu_tpu.config import Config, ModelConfig
    from lss2_multimodal_nu_tpu.models.factory import build_model
    from __graft_entry__ import _fake_inputs

    from lss2_multimodal_nu_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    cfg = Config(
        model=ModelConfig(
            family="vovnet_transformer", vovnet_type="vovnet39", lss_version="v2",
            effnet_variant="b4", compute_dtype=dtype,
        )
    )
    model = build_model(cfg)
    inputs = _fake_inputs(b=batch, seed=0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
    floor = measure_floor(jax, jnp)
    print(f"call floor: {floor*1e3:.1f} ms")

    K, M = 6, 3

    def timed(name, fn, *stacked_args):
        """fn(*unstacked) -> pytree; args are stacked along a leading K axis."""

        @jax.jit
        def run(va, args):
            def one(t):
                out = fn(va, *t)
                leaves = jax.tree.leaves(out)
                return sum(jnp.sum(o.astype(jnp.float32)) for o in leaves)

            return jnp.sum(jax.lax.map(one, args))

        args = jax.block_until_ready(stacked_args)
        float(run(variables, args))
        best = float("inf")
        for _ in range(M):
            t0 = time.time()
            float(run(variables, args))
            best = min(best, time.time() - t0)
        ms = max(best - floor, 0.0) / K * 1e3
        print(f"{name:34s} {ms:8.2f} ms   ({ms/batch:6.2f} ms/frame)")
        return ms

    # ---- precompute stage inputs on device (one jit, real values) ----
    b, n = batch, 6

    @jax.jit
    def prefix(va, imgs, rots, trans, intrins, post_rots, post_trans):
        # the model's OWN stage methods (no re-inlined math — a layout
        # change in the model cannot silently desync this profiler)
        def go(mod, imgs, rots, trans, intrins, post_rots, post_trans):
            c3, c4 = mod.encode_cameras(imgs, False)
            bev_feats = mod.lift_to_bev(
                c3, c4, rots, trans, intrins, post_rots, post_trans, False
            )
            bev_seg, bev_refined = mod.bev_encoder(bev_feats, False)
            return c3, c4, bev_feats, bev_refined

        return model.apply(va, imgs, rots, trans, intrins, post_rots, post_trans, method=go)

    c3, c4, bev_feats, bev_refined = jax.block_until_ready(
        prefix(variables, *inputs)
    )

    def stack(x, jitter=1e-3):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.stack([x + jnp.asarray(jitter * i, x.dtype) for i in range(K)])
        return jnp.stack([x] * K)

    sets = [_fake_inputs(b=batch, seed=s) for s in range(K)]
    st_inputs = tuple(jnp.stack([s[i] for s in sets]) for i in range(6))

    # ---- stage timings ----
    def full(va, *ins):
        out = model.apply(va, *ins)
        return out

    t_full = timed("FULL forward", full, *st_inputs)

    t_bb = timed(
        "backbone (VoVNet39 x6 cams)",
        lambda va, imgs: model.apply(va, imgs, method="encode_cameras"),
        st_inputs[0],
    )

    sc3, sc4 = stack(c3), stack(c4)
    st_geo = tuple(st_inputs[i] for i in range(1, 6))
    t_ls = timed(
        "depth+cam+geometry+lift_splat",
        lambda va, *a: model.apply(va, *a, method="lift_to_bev"),
        sc3, sc4, *st_geo,
    )

    sbev = stack(bev_feats)
    t_be = timed(
        "bev_encoder (transformer+seg)",
        lambda va, bf: model.apply(
            va, bf, method=lambda mod, bf: mod.bev_encoder(bf, False)
        ),
        sbev,
    )

    sref = stack(bev_refined)
    t_tx = timed(
        "TXT branch (pyr..predictor)",
        lambda va, *a: model.apply(va, *a, method="txt_branch"),
        sc3, sref,
    )

    acc = t_bb + t_ls + t_be + t_tx
    print("-" * 64)
    print(f"{'sum of stages':34s} {acc:8.2f} ms   vs full {t_full:.2f} ms")
    print(f"flagship fps @B={batch}: {batch / (t_full / 1e3):.1f}")


if __name__ == "__main__":
    main()
