"""Sub-stage timing of BEVEncoderTransformer (90% of flagship forward time).

The encoder is @nn.compact, so sub-stages are timed by applying standalone
module instances against the corresponding parameter subtrees.

Usage: python scripts/profile_bev_encoder.py [batch] [dtype]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as fnn

    from bench import measure_floor
    from lss2_multimodal_nu_tpu.config import Config, ModelConfig
    from lss2_multimodal_nu_tpu.models.factory import build_model
    from lss2_multimodal_nu_tpu.nn.layers import ConvBN
    from lss2_multimodal_nu_tpu.nn.transformer import (
        DeformableAttention,
        LightweightBEVTransformer,
        sine_position_embedding,
    )
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
    b, n = batch, 6
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    def sub(path):
        """Extract {params, batch_stats} subtree at a /-path under bev_encoder."""
        out = {}
        for col in ("params", "batch_stats"):
            t = variables.get(col, {})
            for k in path.split("/"):
                if not isinstance(t, dict) or k not in t:
                    t = None
                    break
                t = t[k]
            if t is not None:
                out[col] = t
        return out

    def timed(name, fn, *stacked_args, k=None):
        k = K if k is None else k

        @jax.jit
        def run(args):
            def one(t):
                out = fn(*t)
                leaves = jax.tree.leaves(out)
                return sum(jnp.sum(o.astype(jnp.float32)) for o in leaves)

            return jnp.sum(jax.lax.map(one, args))

        args = jax.block_until_ready(stacked_args)
        float(run(args))
        best = float("inf")
        for _ in range(M):
            t0 = time.time()
            float(run(args))
            best = min(best, time.time() - t0)
        ms = max(best - floor, 0.0) / k * 1e3
        print(f"{name:40s} {ms:8.2f} ms")
        return ms

    # real bev_feats from a prefix run
    @jax.jit
    def prefix(va, imgs, rots, trans, intrins, post_rots, post_trans):
        def go(mod, imgs, rots, trans, intrins, post_rots, post_trans):
            x = imgs.reshape(b * n, *imgs.shape[2:])
            feats = mod.backbone(x, False)
            c3, c4 = feats["c3"], feats["c4"]
            depth = mod.depth_net(c3, c4, False)
            feat = mod.cam_encode(c3)
            fh, fw = feat.shape[1], feat.shape[2]
            from lss2_multimodal_nu_tpu.core.geometry import (
                get_geometry,
                voxel_indices,
            )
            from lss2_multimodal_nu_tpu.ops.lift_splat import lift_splat

            dep = jnp.moveaxis(depth.reshape(b, n, fh, fw, mod.depth_bins), -1, 2)
            fe = feat.reshape(b, n, fh, fw, mod.cam_c)
            geom = get_geometry(
                jnp.asarray(mod.frustum), rots, trans, intrins, post_rots, post_trans
            )
            idx, valid = voxel_indices(geom, mod.dx, mod.bx, mod.nx)
            return lift_splat(fe, dep, idx, valid, mod.nx)

        return model.apply(va, imgs, rots, trans, intrins, post_rots, post_trans, method=go)

    bev_feats = jax.block_until_ready(prefix(variables, *inputs))
    print("bev_feats:", bev_feats.shape, bev_feats.dtype)

    def stack(x, jitter=1e-3):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.stack([x + jnp.asarray(jitter * i, x.dtype) for i in range(K)])
        return jnp.stack([x] * K)

    sbev = stack(bev_feats)

    # full encoder via the parent model
    def bevenc(bf):
        def go(mod, bf):
            return mod.bev_encoder(bf, False)

        return model.apply(variables, bf, method=go)

    timed("bev_encoder FULL", bevenc, sbev)

    compress_mod = ConvBN(256, (1, 1), use_bias=True, dtype=cdt)
    va_compress = sub("bev_encoder/compress")

    def compress_only(bf):
        return compress_mod.apply(va_compress, bf, False)

    timed("  compress ConvBN 1x1", compress_only, sbev)

    x = jax.block_until_ready(compress_mod.apply(va_compress, bev_feats, False))
    sx = stack(x)

    tr_mod = LightweightBEVTransformer(
        d_model=256, n_heads=8, dim_feedforward=1024, dropout=0.1, dtype=cdt
    )
    va_tr = sub("bev_encoder/transformer")

    def transformer_only(xc):
        return tr_mod.apply(va_tr, xc, False)

    timed("  LightweightBEVTransformer", transformer_only, sx)

    refined = jax.block_until_ready(tr_mod.apply(va_tr, x, False))
    sref = stack(refined)

    seg0 = ConvBN(128, (3, 3), use_bias=True, dtype=cdt)
    seg1 = ConvBN(64, (3, 3), use_bias=True, dtype=cdt)
    seg_out = fnn.Conv(4, (1, 1), dtype=cdt)
    va_s0, va_s1, va_so = (
        sub("bev_encoder/seg0"), sub("bev_encoder/seg1"), sub("bev_encoder/seg_out")
    )

    def seghead(r):
        y = seg0.apply(va_s0, r, False)
        y = seg1.apply(va_s1, y, False)
        return seg_out.apply(va_so, y)

    timed("  seg head (seg0+seg1+seg_out)", seghead, sref)

    # ---- inside DeformableAttention ----
    h = w = x.shape[1]
    c = x.shape[-1]
    nh, npts, dh = 8, 8, c // 8
    nq = h * w

    pos = jnp.asarray(sine_position_embedding(h, w, c // 2), dtype=x.dtype).reshape(
        1, nq, c
    )
    xf = x.reshape(b, nq, c)
    q = xf + pos
    ys = np.linspace(0, 1, h, dtype=np.float32)
    xs_ = np.linspace(0, 1, w, dtype=np.float32)
    gy, gx = np.meshgrid(ys, xs_, indexing="ij")
    ref = jnp.asarray(np.stack([gx, gy], axis=-1).reshape(nq, 2))

    sq, sxf = stack(q), stack(xf)

    da_mod = DeformableAttention(256, 8, 8, dtype=cdt)
    va_da = sub("bev_encoder/transformer/encoder/self_attn")

    def deform_full(q_, xf_):
        return da_mod.apply(va_da, q_, xf_, ref)

    timed("  DeformableAttention FULL", deform_full, sq, sxf)

    # prologue: the two small denses + transposes + softmax + value proj
    p_off = va_da["params"]["sampling_offsets"]
    p_att = va_da["params"]["attention_weights"]
    p_val = va_da["params"]["value_proj"]

    def deform_prologue(q_, xf_):
        offsets = (q_ @ p_off["kernel"].astype(cdt)) + p_off["bias"].astype(cdt)
        offsets = jnp.transpose(offsets, (0, 2, 1)).reshape(b, nh, npts, 2, nq)
        attn = (q_ @ p_att["kernel"].astype(cdt)) + p_att["bias"].astype(cdt)
        attn = jnp.transpose(attn, (0, 2, 1)).reshape(b, nh, npts, nq)
        attn = fnn.softmax(attn, axis=2)
        refx = ref[None][..., 0][:, None, None, :]
        refy = ref[None][..., 1][:, None, None, :]
        lx = jnp.clip(refx + offsets[:, :, :, 0, :] / h, 0.0, 1.0)
        ly = jnp.clip(refy + offsets[:, :, :, 1, :] / h, 0.0, 1.0)
        v = (xf_ @ p_val["kernel"].astype(cdt)) + p_val["bias"].astype(cdt)
        v_cm = jnp.transpose(v, (0, 2, 1)).reshape(b * nh, dh, nq)
        return lx, ly, attn, v_cm

    timed("    prologue (denses+transposes)", deform_prologue, sq, sxf)

    # sampling kernel alone on representative inputs
    from lss2_multimodal_nu_tpu.ops.deformable_sampling import (
        deformable_sample_combine_xy,
    )

    rng = np.random.default_rng(0)
    v_cm = jnp.asarray(rng.normal(size=(b * nh, dh, nq)).astype(np.float32)).astype(cdt)
    lx = jnp.asarray(rng.uniform(0, 1, (b * nh, npts, nq)).astype(np.float32))
    ly = jnp.asarray(rng.uniform(0, 1, (b * nh, npts, nq)).astype(np.float32))
    at = jnp.asarray(
        (rng.uniform(0.1, 1, (b * nh, npts, nq)) / npts).astype(np.float32)
    )
    sv, slx, sly, sat = stack(v_cm), stack(lx), stack(ly), stack(at)

    def sampling_only(v_, lx_, ly_, at_):
        return deformable_sample_combine_xy(
            v_, lx_, ly_, at_, h, w, impl="pallas", prefold=True, keep_pad=True
        )

    timed("    sampling kernel (pallas)", sampling_only, sv, slx, sly, sat)

    # FoldingDense alone (k=2: the K-stacked prefold input is ~1 GB/copy)
    del sv, slx, sly, sat, sq, sxf, sbev, sref, sx
    from lss2_multimodal_nu_tpu.nn.transformer import FoldingDense

    n_pad = -(-nq // 2048) * 2048
    pre = jnp.asarray(
        rng.normal(size=(b, nh, n_pad, 4 * dh)).astype(np.float32)
    ).astype(cdt)
    spre = jnp.stack([pre, pre + jnp.asarray(1e-3, cdt)])
    del pre
    fd_mod = FoldingDense(256, 8, dtype=cdt)
    va_fd = {"params": va_da["params"]["output_proj"]}

    def folding_only(p_):
        return fd_mod.apply(va_fd, p_)

    timed("    FoldingDense output proj", folding_only, spre, k=2)
    del spre

    # FFN tail (fused pallas) on representative input
    from lss2_multimodal_nu_tpu.ops import ffn_pallas

    enc_p = sub("bev_encoder/transformer/encoder")["params"]
    u = jnp.asarray(rng.normal(size=(b, nq, c)).astype(np.float32)).astype(cdt)
    su = stack(u)

    def ffn_only(u_):
        return ffn_pallas.fused_ffn_ln(
            u_,
            enc_p["linear1"]["kernel"], enc_p["linear1"]["bias"],
            enc_p["linear2"]["kernel"], enc_p["linear2"]["bias"],
            enc_p["norm1"]["scale"], enc_p["norm1"]["bias"],
            enc_p["norm2"]["scale"], enc_p["norm2"]["bias"],
            compute_dtype=cdt,
        )

    timed("    fused FFN/LN tail", ffn_only, su)


if __name__ == "__main__":
    main()
