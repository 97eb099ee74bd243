"""Stack-B fusion & prediction heads (reference src/model_vovnet_transformer.py:125-351)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops import seg_head_pallas
from ..parallel.mesh import constrain_batch
from .layers import ConvBN, Dtype, global_avg_pool
from .transformer import LightweightBEVTransformer


class MultiHeadAttention(nn.Module):
    """torch nn.MultiheadAttention-equivalent (batch_first), separate q/k/v
    projections (the porter splits torch's packed in_proj)."""

    d_model: int
    n_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, train: bool = False):
        b, nq, c = q.shape
        nk = k.shape[1]
        dh = c // self.n_heads

        def proj(x, name):
            return nn.Dense(c, dtype=self.dtype, name=name)(x)

        qh = proj(q, "q_proj").reshape(b, nq, self.n_heads, dh)
        kh = proj(k, "k_proj").reshape(b, nk, self.n_heads, dh)
        vh = proj(v, "v_proj").reshape(b, nk, self.n_heads, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(dh, dtype=qh.dtype)
        )
        attn = nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, nq, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class BEVEncoderTransformer(nn.Module):
    """Compress C*Z -> 256, transformer refine, 3-conv seg head. Returns
    (seg logits, refined features) (reference :125-173)."""

    out_features: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(256, (1, 1), use_bias=True, dtype=self.dtype, name="compress")(
            x, train
        )
        refined = LightweightBEVTransformer(
            d_model=256, n_heads=8, dim_feedforward=1024, dropout=0.1,
            dtype=self.dtype, name="transformer",
        )(x, train)
        seg0 = ConvBN(128, (3, 3), use_bias=True, dtype=self.dtype, name="seg0")
        seg1 = ConvBN(64, (3, 3), use_bias=True, dtype=self.dtype, name="seg1")
        seg_out = nn.Conv(self.out_features, (1, 1), dtype=self.dtype, name="seg_out")

        bh, hh, ww, cc = refined.shape
        if (
            not train
            and self.dtype == jnp.bfloat16  # f32 working set exceeds VMEM
            and seg_head_pallas.enabled_for_backend()
            and seg_head_pallas.supports(hh, ww, cc, 128, 64, self.out_features)
        ):
            # Inference seg head fused into one Pallas kernel (BN folded into
            # the convs; see ops.seg_head_pallas). Zero-width calls
            # materialize the identical param tree the XLA path would.
            _ = seg_out(seg1(seg0(refined[:, :0], train), train))
            p = lambda m, c: m.variables["params"][c]
            s = lambda m: m.variables["batch_stats"]["bn"]
            w0, b0 = seg_head_pallas.fold_conv_bn(
                p(seg0, "conv")["kernel"], p(seg0, "conv")["bias"],
                p(seg0, "bn")["scale"], p(seg0, "bn")["bias"],
                s(seg0)["mean"], s(seg0)["var"], seg0.bn_eps,
            )
            w1, b1 = seg_head_pallas.fold_conv_bn(
                p(seg1, "conv")["kernel"], p(seg1, "conv")["bias"],
                p(seg1, "bn")["scale"], p(seg1, "bn")["bias"],
                s(seg1)["mean"], s(seg1)["var"], seg1.bn_eps,
            )
            w2 = seg_out.variables["params"]["kernel"]
            b2 = seg_out.variables["params"]["bias"]
            seg = seg_head_pallas.fused_seg_head(
                refined.reshape(bh, hh * ww, cc), w0, b0, w1, b1,
                w2.reshape(w2.shape[2], w2.shape[3]), b2, hh, ww,
            ).astype(self.dtype)
        else:
            y = seg0(refined, train)
            y = seg1(y, train)
            seg = seg_out(y)
        return seg, refined


class AdaptiveFeaturePyramid(nn.Module):
    """Parallel dilated 3x3 convs (d=1,2) + 1x1 fuse (reference :176-214)."""

    out_features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s1 = ConvBN(self.out_features, (3, 3), use_bias=True, dtype=self.dtype,
                    name="scale1")(x, train)
        s2 = ConvBN(self.out_features, (3, 3), dilation=(2, 2), use_bias=True,
                    dtype=self.dtype, name="scale2")(x, train)
        y = jnp.concatenate([s1, s2], axis=-1)
        return ConvBN(self.out_features, (1, 1), use_bias=True, dtype=self.dtype,
                      name="fusion")(y, train)


class LightweightCameraTransformer(nn.Module):
    """Single-layer cross-camera self-attention over the N=6 camera tokens
    (reference :217-264). Active for ablations V2/V3."""

    d_model: int = 256
    n_heads: int = 4
    dropout: float = 0.1
    n_cameras: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, camera_ids, train: bool = False):
        emb = nn.Embed(self.n_cameras, self.d_model, dtype=self.dtype, name="cam_embed")(
            camera_ids
        )
        x = x + emb
        attn = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, dtype=self.dtype, name="self_attn"
        )(x, x, x, train)
        # batch-sharding hints at the residual adds (see nn/transformer.py)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(constrain_batch(x + attn))
        y = nn.Dense(self.d_model * 2, dtype=self.dtype, name="ffn0")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="ffn1")(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(constrain_batch(x + y))


class BEVCameraFusion(nn.Module):
    """Cameras cross-attend to the globally-pooled BEV token (reference
    :267-304). Active for ablation V3."""

    d_model: int = 256
    n_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, camera_feat, bev_feat, train: bool = False):
        # (B,1,C); batch hint: the pool's reshape loses the sharding trail
        bev_tok = constrain_batch(
            global_avg_pool(bev_feat, keepdims=False)[:, None, :]
        )
        fused = MultiHeadAttention(
            self.d_model, self.n_heads, 0.1, dtype=self.dtype, name="cross_attn"
        )(camera_feat, bev_tok, bev_tok, train)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(camera_feat + fused)


class UnifiedPredictor(nn.Module):
    """Learned softmax camera weights -> MLP -> action/desc heads
    (reference :307-351)."""

    num_action_classes: int = 4
    num_desc_classes: int = 8
    n_cameras: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, camera_features, train: bool = False):
        b, n, c = camera_features.shape
        w = self.param(
            "camera_weights",
            lambda key, shape: jnp.full(shape, 1.0 / self.n_cameras),
            (self.n_cameras,),
        )
        w = nn.softmax(w.astype(camera_features.dtype), axis=0).reshape(1, n, 1)
        x = (camera_features * w).sum(axis=1)  # (B, C)
        x = nn.Dense(512, dtype=self.dtype, name="enc0")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="enc_norm0")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Dense(256, dtype=self.dtype, name="enc1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="enc_norm1")(x)
        x = nn.gelu(x, approximate=False)
        action = nn.Dense(self.num_action_classes, dtype=self.dtype, name="action_head")(x)
        desc = nn.Dense(self.num_desc_classes, dtype=self.dtype, name="desc_head")(x)
        return action, desc
