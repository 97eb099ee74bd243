"""VoVNet-V2 backbones (OSA + eSE), Flax/NHWC.

Two variants exist in the reference and both are reproduced:
  * `VoVNetV2` — faithful to the timm `ese_vovnet39b/57b` architecture the
    main model actually uses (src/vovnet_timm.py:48-58): stem stride 4
    (convs s2,s1,s2), OSA stages with mid-width convs, stage4 downsamples to
    stride 32 ⇒ c4 is half the spatial size of c3. Weight-portable from timm.
  * `VoVNetSimple` — the repo's from-scratch backbone
    (src/vovnet_backbone.py:77-302): stem (s2) + shared 3x3/s2 ceil pool,
    OSA convs at out_ch width, stage4 has NO extra downsample ⇒ c3 and c4
    share stride 16.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN, Dtype, global_avg_pool, hard_sigmoid, max_pool_ceil

# timm ese_vovnet configs: (stem_chs, stage_conv_chs, stage_out_chs,
# layer_per_block, block_per_stage)
TIMM_CONFIGS = {
    "vovnet39": (
        (64, 64, 128),
        (128, 160, 192, 224),
        (256, 512, 768, 1024),
        5,
        (1, 1, 2, 2),
    ),
    "vovnet57": (
        (64, 64, 128),
        (128, 160, 192, 224),
        (256, 512, 768, 1024),
        5,
        (1, 1, 4, 3),
    ),
    # vovnet99 has no timm weights (reference vovnet_backbone.py:201); deeper
    # stage repeats per the VoVNet paper
    "vovnet99": (
        (64, 64, 128),
        (128, 160, 192, 224),
        (256, 512, 768, 1024),
        5,
        (1, 3, 9, 3),
    ),
}


# OSA aggregation form switch (see OSABlock): prefer the materialized concat
# only when spatial extent is at least this many pixels. Tuned on TPU v5e at
# inference batch shapes (scripts/bench_osa.py, 2026-08 A/B); retune for other
# chips/resolutions — both forms are algebraically identical, so this is
# perf-only.
CONCAT_SPATIAL_MIN = 1024


class ESEModule(nn.Module):
    """Effective squeeze-excitation: pool -> 1x1 conv -> hardsigmoid gate."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = global_avg_pool(x)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc")(s)
        return x * hard_sigmoid(s)


class OSABlock(nn.Module):
    """One-shot aggregation block: `layers` progressive 3x3 convs at
    `mid_features` width, single concat, 1x1 projection, eSE, optional
    identity residual."""

    mid_features: int
    out_features: int
    layers: int = 5
    residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        outs = [x]
        for i in range(self.layers):
            x = ConvBN(self.mid_features, (3, 3), dtype=self.dtype, name=f"conv{i}")(
                x, train
            )
            outs.append(x)
        # Aggregation 1x1, two algebraically identical forms with the same
        # param tree (kernel (1,1,sum(C_i),out)) — picked by shape, from the
        # per-stage v5e A/B in scripts/bench_backbone.py:
        #   * materialized concat + one matmul wins when every branch is
        #     128-lane aligned (concat is layout-clean) and the spatial extent
        #     is large (stage1: 0.50 vs 0.88 ms — the split's f32 partial
        #     accumulators cost ~1 GB of HBM traffic at 101k rows);
        #   * the concat-free split-sum wins when branches are NOT lane
        #     aligned or spatial is small, where the padded concat dominates
        #     (stage2 0.32 vs 0.50, stage3 0.066 vs 0.17, stage4 0.016 vs 0.059).
        agg = ConvBN(self.out_features, (1, 1), dtype=self.dtype, name="concat_conv")
        lane_aligned = all(t.shape[-1] % 128 == 0 for t in outs)
        if lane_aligned and x.shape[1] * x.shape[2] >= CONCAT_SPATIAL_MIN:
            x = agg(jnp.concatenate(outs, axis=-1), train)
        else:
            x = agg(outs, train)
        x = ESEModule(dtype=self.dtype, name="ese")(x)
        if self.residual and identity.shape[-1] == self.out_features:
            x = x + identity
        return x


class VoVNetV2(nn.Module):
    """timm-architecture ese_vovnet. Returns {'c3': stride16, 'c4': stride32}."""

    model_name: str = "vovnet39"
    dtype: Dtype = jnp.float32

    c3_channels: int = 768
    c4_channels: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        stem_chs, conv_chs, out_chs, layers, blocks = TIMM_CONFIGS[self.model_name]
        # stem: s2, s1, s2  (overall stride 4)
        for i, (ch, s) in enumerate(zip(stem_chs, (2, 1, 2))):
            x = ConvBN(ch, (3, 3), strides=(s, s), dtype=self.dtype, name=f"stem{i}")(
                x, train
            )
        feats = {}
        for stage in range(4):
            if stage > 0:  # stages 2-4 open with a ceil-mode 3x3/s2 pool
                x = max_pool_ceil(x, (3, 3), (2, 2), ceil_mode=True)
            for b in range(blocks[stage]):
                x = OSABlock(
                    conv_chs[stage],
                    out_chs[stage],
                    layers=layers,
                    residual=b > 0,
                    dtype=self.dtype,
                    name=f"stage{stage + 1}_block{b}",
                )(x, train)
            if stage == 2:
                feats["c3"] = x  # 768 @ stride 16
        feats["c4"] = x  # 1024 @ stride 32
        return feats


class VoVNetSimple(nn.Module):
    """The reference's from-scratch backbone (vovnet_backbone.py): both c3 and
    c4 at stride 16, OSA convs at out_ch width, 256-ch stem."""

    model_name: str = "vovnet57"
    dtype: Dtype = jnp.float32

    # (blocks, out_ch) per stage — vovnet_backbone.py:87-118
    STAGE_CONFIGS = {
        "vovnet39": ((1, 256), (1, 512), (1, 768), (1, 1024)),
        "vovnet57": ((1, 256), (1, 512), (2, 768), (2, 1024)),
        "vovnet99": ((1, 256), (1, 512), (2, 768), (2, 1024)),
    }

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        stem_ch = 128
        x = ConvBN(stem_ch, (3, 3), strides=(2, 2), dtype=self.dtype, name="stem0")(x, train)
        x = ConvBN(stem_ch, (3, 3), dtype=self.dtype, name="stem1")(x, train)
        x = ConvBN(256, (3, 3), dtype=self.dtype, name="stem2")(x, train)

        cfg = self.STAGE_CONFIGS[self.model_name]
        x = max_pool_ceil(x, (3, 3), (2, 2), (1, 1))
        for b in range(cfg[0][0]):
            x = OSABlock(cfg[0][1], cfg[0][1], residual=b > 0, dtype=self.dtype,
                         name=f"stage1_block{b}")(x, train)
        x = max_pool_ceil(x, (3, 3), (2, 2), (1, 1))
        for b in range(cfg[1][0]):
            x = OSABlock(cfg[1][1], cfg[1][1], residual=b > 0, dtype=self.dtype,
                         name=f"stage2_block{b}")(x, train)
        x = max_pool_ceil(x, (3, 3), (2, 2), (1, 1))
        c3 = x
        for b in range(cfg[2][0]):
            c3 = OSABlock(cfg[2][1], cfg[2][1], residual=b > 0, dtype=self.dtype,
                          name=f"stage3_block{b}")(c3, train)
        c4 = c3
        for b in range(cfg[3][0]):
            c4 = OSABlock(cfg[3][1], cfg[3][1], residual=b > 0, dtype=self.dtype,
                          name=f"stage4_block{b}")(c4, train)
        return {"c3": c3, "c4": c4}
