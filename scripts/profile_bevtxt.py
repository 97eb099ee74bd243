"""Per-stage timing of the BevTxt (published paper model) forward on the
real TPU chip — same floor-subtracted, scan-amortized methodology as
`profile_flagship.py`, so stage times sum (approximately) to the
end-to-end frame time.

Usage: python scripts/profile_bevtxt.py [batch] [dtype]
"""
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
            family="bev_txt", effnet_variant="b4", compute_dtype=dtype
        )
    )
    model = build_model(cfg)
    inputs = _fake_inputs(b=batch, seed=0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
    floor = measure_floor(jax, jnp)
    print(f"call floor: {floor*1e3:.1f} ms")

    K, M = 6, 3
    b, n = batch, 6

    def timed(name, fn, *stacked_args):
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
        print(f"{name:36s} {ms:8.2f} ms   ({ms/batch:6.2f} ms/frame)")
        return ms

    # ---- precompute stage inputs on device ----
    # composes ONLY model methods (LSS.lift/splat, BevTxt.txt_branch) so the
    # profiled math can never drift from BevTxt.__call__'s semantics
    @jax.jit
    def prefix(va, imgs, rots, trans, intrins, post_rots, post_trans):
        def go(mod, imgs, rots, trans, intrins, post_rots, post_trans):
            x = imgs.reshape(b * n, *imgs.shape[2:])
            cam_feats = mod.lss.encoder(x, False)
            depth, feat = mod.lss.lift(cam_feats, b, n, False)
            vox = mod.lss.splat(
                feat, depth, rots, trans, intrins, post_rots, post_trans
            )
            bev = mod.lss.bevencode(vox, False)
            return cam_feats, feat, depth, vox, bev

        return model.apply(
            va, imgs, rots, trans, intrins, post_rots, post_trans, method=go
        )

    cam_feats, feat, depth, vox, bev = jax.block_until_ready(
        prefix(variables, *inputs)
    )

    def stack(x, jitter=1e-3):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.stack([x + jnp.asarray(jitter * i, x.dtype) for i in range(K)])
        return jnp.stack([x] * K)

    sets = [_fake_inputs(b=batch, seed=s) for s in range(K)]
    st_inputs = tuple(jnp.stack([s[i] for s in sets]) for i in range(6))

    t_full = timed("FULL forward", lambda va, *ins: model.apply(va, *ins), *st_inputs)

    def encoder(va, imgs):
        def go(mod, imgs):
            x = imgs.reshape(b * n, *imgs.shape[2:])
            return mod.lss.encoder(x, False)

        return model.apply(va, imgs, method=go)

    t_enc = timed("encoder (EffNet-B4 x6 cams)", encoder, st_inputs[0])

    scf = stack(cam_feats)

    def camenc(va, cf):
        def go(mod, cf):
            return mod.lss.camencode(cf, False)

        return model.apply(va, cf, method=go)

    t_ce = timed("camencode (depthnet)", camenc, scf)

    sfeat, sdepth = stack(feat), stack(depth)
    st_geo = tuple(st_inputs[i] for i in range(1, 6))

    def liftsplat(va, feat, depth, *geo):
        return model.apply(
            va, feat, depth, *geo, method=lambda mod, *a: mod.lss.splat(*a)
        )

    t_ls = timed("geometry + lift_splat", liftsplat, sfeat, sdepth, *st_geo)

    svox = stack(vox)

    def bevenc(va, v):
        def go(mod, v):
            return mod.lss.bevencode(v, False)

        return model.apply(va, v, method=go)

    t_be = timed("bevencode (ResNet18 decoder)", bevenc, svox)

    sbev, scf2 = stack(bev), stack(cam_feats)

    def txt(va, bev, cam_feats):
        return model.apply(va, bev, cam_feats, method="txt_branch")

    t_tx = timed("TXT branch (ASPP..predictors)", txt, sbev, scf2)

    acc = t_enc + t_ce + t_ls + t_be + t_tx
    print(f"{'stage sum':36s} {acc:8.2f} ms   (full: {t_full:.2f})")


if __name__ == "__main__":
    main()
