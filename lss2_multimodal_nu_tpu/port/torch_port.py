"""PyTorch -> Flax weight porting (SURVEY §7.6; BASELINE north star).

Converts flat torch `state_dict` numpy trees (key -> array) into this
framework's `{params, batch_stats}` trees, handling:
  * conv OIHW -> HWIO (depthwise (C,1,kh,kw) -> (kh,kw,1,C));
  * linear (out,in) -> (in,out);
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var;
  * torch nn.MultiheadAttention packed in_proj -> split q/k/v projections.

Mappings are generated programmatically from the same configs that build the
Flax modules, so block indices always line up. Source naming follows the
reference dependencies: efficientnet_pytorch (`_blocks.N._expand_conv`...),
torchvision resnet18 (`layer1.0.conv1`...), timm ese_vovnet
(`stages.S.blocks.B.conv_mid.I.conv`...), and the reference's own modules
(src/modules.py, src/model_vovnet_transformer.py, src/transformer_modules.py).

Use `state_dict_from_torch_file` to load `.pt`/`.pth` checkpoints saved by the
reference scripts (requires torch).
"""
from __future__ import annotations

import math
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

Tree = Dict[str, Any]


# ---------------------------------------------------------------- primitives
def conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def depthwise_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # (C,1,k,k) -> (k,k,1,C)


def linear_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def _set(tree: Tree, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


class Porter:
    """Accumulates mapping rules, then executes them over a torch state dict."""

    def __init__(self):
        self.rules: List[Tuple[Tuple[str, ...], str, str]] = []

    def conv(self, flax_path: str, torch_key: str, bias: bool = False, depthwise=False):
        kind = "dwconv" if depthwise else "conv"
        self.rules.append((tuple(flax_path.split("/")) + ("kernel",), torch_key + ".weight", kind))
        if bias:
            self.rules.append((tuple(flax_path.split("/")) + ("bias",), torch_key + ".bias", "copy"))

    def bn(self, flax_path: str, torch_key: str):
        p = tuple(flax_path.split("/"))
        self.rules.append((p + ("scale",), torch_key + ".weight", "copy"))
        self.rules.append((p + ("bias",), torch_key + ".bias", "copy"))
        self.rules.append((("__bs__",) + p + ("mean",), torch_key + ".running_mean", "copy"))
        self.rules.append((("__bs__",) + p + ("var",), torch_key + ".running_var", "copy"))

    def conv_bn(self, flax_path: str, torch_conv: str, torch_bn: str, bias=False):
        self.conv(flax_path + "/conv", torch_conv, bias=bias)
        self.bn(flax_path + "/bn", torch_bn)

    def linear(self, flax_path: str, torch_key: str, bias: bool = True):
        p = tuple(flax_path.split("/"))
        self.rules.append((p + ("kernel",), torch_key + ".weight", "linear"))
        if bias:
            self.rules.append((p + ("bias",), torch_key + ".bias", "copy"))

    def layernorm(self, flax_path: str, torch_key: str):
        p = tuple(flax_path.split("/"))
        self.rules.append((p + ("scale",), torch_key + ".weight", "copy"))
        self.rules.append((p + ("bias",), torch_key + ".bias", "copy"))

    def copy(self, flax_path: str, torch_key: str):
        self.rules.append((tuple(flax_path.split("/")), torch_key, "copy"))

    def mha(self, flax_path: str, torch_key: str):
        """torch nn.MultiheadAttention -> q_proj/k_proj/v_proj/out_proj."""
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            p = tuple(f"{flax_path}/{name}".split("/"))
            self.rules.append((p + ("kernel",), f"{torch_key}.in_proj_weight", f"inproj{i}w"))
            self.rules.append((p + ("bias",), f"{torch_key}.in_proj_bias", f"inproj{i}b"))
        self.linear(flax_path + "/out_proj", torch_key + ".out_proj")

    def run(self, state_dict: Dict[str, np.ndarray], strict: bool = True):
        params: Tree = {}
        batch_stats: Tree = {}
        missing = []
        for path, tkey, kind in self.rules:
            if tkey not in state_dict:
                missing.append(tkey)
                continue
            v = np.asarray(state_dict[tkey])
            if kind == "conv":
                v = conv_w(v)
            elif kind == "dwconv":
                v = depthwise_w(v)
            elif kind == "linear":
                v = linear_w(v)
            elif kind.startswith("inproj"):
                i = int(kind[6])
                c = v.shape[0] // 3
                chunk = v[i * c : (i + 1) * c]
                v = linear_w(chunk) if kind.endswith("w") else chunk
            if path[0] == "__bs__":
                _set(batch_stats, path[1:], v)
            else:
                _set(params, path, v)
        if missing and strict:
            raise KeyError(f"missing torch keys: {missing[:10]} (+{max(len(missing)-10,0)})")
        return params, batch_stats, missing


# ---------------------------------------------------------------- builders
def add_up(p: Porter, flax: str, torch: str):
    """nn.Up <- reference Up (modules.py:9-27): conv Sequential 0,1,3,4."""
    p.conv_bn(f"{flax}/conv1", f"{torch}.conv.0", f"{torch}.conv.1")
    p.conv_bn(f"{flax}/conv2", f"{torch}.conv.3", f"{torch}.conv.4")


def add_efficientnet_trunk(p: Porter, flax: str, torch: str, variant: str):
    """EfficientNetTrunk <- efficientnet_pytorch naming."""
    from ..nn.efficientnet import BASE_STAGES, SCALING, round_filters, round_repeats

    p.conv_bn(f"{flax}/stem", f"{torch}._conv_stem", f"{torch}._bn0")
    width, depth = SCALING[variant]
    idx = 0
    for expand, k, s, c, r in BASE_STAGES:
        for i in range(round_repeats(r, depth)):
            blk = f"{flax}/block{idx}"
            t = f"{torch}._blocks.{idx}"
            if expand != 1:
                p.conv_bn(f"{blk}/expand", f"{t}._expand_conv", f"{t}._bn0")
            p.conv(f"{blk}/depthwise/conv", f"{t}._depthwise_conv", depthwise=True)
            p.bn(f"{blk}/depthwise/bn", f"{t}._bn1")
            p.conv(f"{blk}/se_reduce", f"{t}._se_reduce", bias=True)
            p.conv(f"{blk}/se_expand", f"{t}._se_expand", bias=True)
            p.conv_bn(f"{blk}/project", f"{t}._project_conv", f"{t}._bn2")
            idx += 1


def add_encoder(p: Porter, flax: str, torch: str, variant: str, trunk=True):
    """trunk=False skips the EfficientNet mapping (full-model parity tests
    swap in a stub trunk and map its weights themselves)."""
    if trunk:
        add_efficientnet_trunk(p, f"{flax}/trunk", f"{torch}.trunk", variant)
    add_up(p, f"{flax}/up1", f"{torch}.up1")


def add_basic_block(p: Porter, flax: str, torch: str, downsample: bool):
    p.conv_bn(f"{flax}/conv1", f"{torch}.conv1", f"{torch}.bn1")
    p.conv(f"{flax}/conv2", f"{torch}.conv2")
    p.bn(f"{flax}/bn2", f"{torch}.bn2")
    if downsample:
        p.conv_bn(f"{flax}/downsample", f"{torch}.downsample.0", f"{torch}.downsample.1")


def add_bevencode(p: Porter, flax: str, torch: str):
    p.conv(f"{flax}/conv1/conv", f"{torch}.conv1")
    p.bn(f"{flax}/conv1/bn", f"{torch}.bn1")
    for layer, feats in ((1, 64), (2, 128), (3, 256)):
        for i in range(2):
            add_basic_block(
                p, f"{flax}/layer{layer}_{i}", f"{torch}.layer{layer}.{i}",
                downsample=(layer > 1 and i == 0),
            )
    add_up(p, f"{flax}/up1", f"{torch}.up1")
    p.conv_bn(f"{flax}/up2_conv", f"{torch}.up2.1", f"{torch}.up2.2")
    p.conv(f"{flax}/up2_out", f"{torch}.up2.4", bias=True)


def add_bevpost(p: Porter, flax: str, torch: str):
    p.conv_bn(f"{flax}/conv", f"{torch}.post.0", f"{torch}.post.1")


def add_aspp(p: Porter, flax: str, torch: str, rates=(12, 24, 36)):
    p.conv_bn(f"{flax}/conv1x1", f"{torch}.convs.0.0", f"{torch}.convs.0.1")
    for i in range(len(rates)):
        p.conv_bn(f"{flax}/aspp{i}/conv", f"{torch}.convs.{i+1}.0", f"{torch}.convs.{i+1}.1")
    p.conv_bn(f"{flax}/pool_conv", f"{torch}.convs.{len(rates)+1}.1", f"{torch}.convs.{len(rates)+1}.2")
    p.conv_bn(f"{flax}/project", f"{torch}.project.0", f"{torch}.project.1")


def add_sceneunder(p: Porter, flax: str, torch: str):
    add_aspp(p, f"{flax}/aspp", f"{torch}.0")


def add_lss(p: Porter, flax_prefix: str, torch_prefix: str, variant: str,
            trunk=True):
    fx = (flax_prefix + "/") if flax_prefix else ""
    tc = (torch_prefix + ".") if torch_prefix else ""
    add_encoder(p, f"{fx}encoder", f"{tc}encoder", variant, trunk=trunk)
    p.conv(f"{fx}camencode/depthnet", f"{tc}camencode.depthnet", bias=True)
    add_bevencode(p, f"{fx}bevencode", f"{tc}bevencode")


def add_bev_txt(p: Porter, variant: str = "b4", trunk=True):
    """BevTxt <- model_BEV_TXT.BEV_TXT state dict (flat, no prefix)."""
    add_lss(p, "lss", "", variant, trunk=trunk)
    add_sceneunder(p, "sceneunder", "sceneunder")
    add_bevpost(p, "bevpost", "bevpost")
    p.conv_bn("embeder_f1/conv", "embeder_f1.0", "embeder_f1.1")
    p.linear("embeder_f2/fc", "embeder_f2.1")
    p.conv_bn("embeder_lr1/conv", "embeder_lr1.0", "embeder_lr1.1")
    p.linear("embeder_lr2/fc", "embeder_lr2.1")
    for head in ("predictorf1", "predictorf2", "predictorlr"):
        p.linear(f"{head}/fc", f"{head}.0")


def add_bev_txt_onlybev(p: Porter, variant: str = "b4"):
    """BevTxtOnlyBev <- model_baseline.BEV_TXT. The torch model also contains
    a never-used `sceneunder` (dead code, Appendix B) — simply unmapped."""
    add_lss(p, "lss", "", variant)
    add_bevpost(p, "bevpost", "bevpost")
    p.linear("embeder_bev/fc", "embeder_bev.1")
    p.linear("predictor_bev1/fc", "predictor_bev1.0")
    p.linear("predictor_bev2/fc", "predictor_bev2.0")


def add_vovnet_timm(p: Porter, flax: str, torch: str, model_name: str):
    from ..nn.vovnet import TIMM_CONFIGS

    stem_chs, conv_chs, out_chs, layers, blocks = TIMM_CONFIGS[model_name]
    for i in range(len(stem_chs)):
        p.conv_bn(f"{flax}/stem{i}", f"{torch}.stem.{i}.conv", f"{torch}.stem.{i}.bn")
    for s in range(4):
        for b in range(blocks[s]):
            fb = f"{flax}/stage{s+1}_block{b}"
            tb = f"{torch}.stages.{s}.blocks.{b}"
            for i in range(layers):
                p.conv_bn(f"{fb}/conv{i}", f"{tb}.conv_mid.{i}.conv", f"{tb}.conv_mid.{i}.bn")
            p.conv_bn(f"{fb}/concat_conv", f"{tb}.conv_concat.conv", f"{tb}.conv_concat.bn")
            p.conv(f"{fb}/ese/fc", f"{tb}.attn.fc", bias=True)


def add_vovnet_scratch(p: Porter, flax: str, torch: str, model_name="vovnet57"):
    """VoVNetSimple <- the reference's from-scratch backbone
    (src/vovnet_backbone.py:77-302): stem Sequential conv/bn at indices
    (0,1),(3,4),(6,7); per OSA block `layers.{i}.0/.1` convs, `concat_conv.0/.1`,
    and the biased `ese.fc` 1x1 conv (eSEModule, :11-24)."""
    from ..nn.vovnet import VoVNetSimple

    fx = (flax + "/") if flax else ""
    tc = (torch + ".") if torch else ""
    cfg = VoVNetSimple.STAGE_CONFIGS[model_name]
    for i, t in enumerate((0, 3, 6)):
        p.conv_bn(f"{fx}stem{i}", f"{tc}stem.{t}", f"{tc}stem.{t + 1}")
    for s in range(4):
        for b in range(cfg[s][0]):
            fb = f"{fx}stage{s + 1}_block{b}"
            tb = f"{tc}stage{s + 1}.{b}"
            for i in range(5):
                p.conv_bn(f"{fb}/conv{i}", f"{tb}.layers.{i}.0", f"{tb}.layers.{i}.1")
            p.conv_bn(f"{fb}/concat_conv", f"{tb}.concat_conv.0", f"{tb}.concat_conv.1")
            p.conv(f"{fb}/ese/fc", f"{tb}.ese.fc", bias=True)


def add_depth_head(p: Porter, flax: str, torch: str):
    """_DepthHead <- Sequential(conv3x3, bn, relu, conv1x1)."""
    p.conv(f"{flax}/conv/conv", f"{torch}.0", bias=True)
    p.bn(f"{flax}/conv/bn", f"{torch}.1")
    p.conv(f"{flax}/out", f"{torch}.3", bias=True)


def add_convbnrelu_seq(p: Porter, flax: str, torch: str, bias=True):
    """ConvBN(use_bias) <- Sequential(conv, bn, relu)."""
    p.conv(f"{flax}/conv", f"{torch}.0", bias=bias)
    p.bn(f"{flax}/bn", f"{torch}.1")


def add_deformable_attention(p: Porter, flax: str, torch: str):
    for lin in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
        p.linear(f"{flax}/{lin}", f"{torch}.{lin}")


def add_bev_transformer(p: Porter, flax: str, torch: str):
    enc_f, enc_t = f"{flax}/encoder", f"{torch}.encoder"
    add_deformable_attention(p, f"{enc_f}/self_attn", f"{enc_t}.self_attn")
    p.linear(f"{enc_f}/linear1", f"{enc_t}.linear1")
    p.linear(f"{enc_f}/linear2", f"{enc_t}.linear2")
    p.layernorm(f"{enc_f}/norm1", f"{enc_t}.norm1")
    p.layernorm(f"{enc_f}/norm2", f"{enc_t}.norm2")


def add_vovnet_transformer(p: Porter, model_name="vovnet39", lss_version="v2",
                           use_camera_attn=True, use_cross_attn=True,
                           backbone=True):
    """VoVNetBEVTransformer <- model_vovnet_transformer state dict. The timm
    backbone nests one level deeper (backbone.backbone = timm model).
    backbone=False skips the trunk mapping (full-model parity tests swap in
    a stub backbone and map its weights themselves)."""
    if backbone:
        add_vovnet_timm(p, "backbone", "backbone.backbone", model_name)
    if lss_version == "v2":
        add_depth_head(p, "depth_net/depth_c3", "depth_net.depth_c3")
        add_depth_head(p, "depth_net/depth_c4", "depth_net.depth_c4")
        p.conv("depth_net/fusion/conv", "depth_net.fusion.0", bias=True)
        p.bn("depth_net/fusion/bn", "depth_net.fusion.1")
    else:
        add_depth_head(p, "depth_net/depth_head", "depth_net.depth_head")
    p.conv("cam_encode/feat_proj", "cam_encode.feat_proj", bias=True)
    # BEV encoder
    add_convbnrelu_seq(p, "bev_encoder/compress", "bev_encoder.compress")
    add_bev_transformer(p, "bev_encoder/transformer", "bev_encoder.transformer")
    # seg_head is one FLAT Sequential (model_vovnet_transformer.py:146-154):
    # conv/bn at indices 0/1, 3/4, conv at 6 (a nested .0.0 mapping here was
    # a porter bug caught by test_reference_stackb_parity)
    p.conv("bev_encoder/seg0/conv", "bev_encoder.seg_head.0", bias=True)
    p.bn("bev_encoder/seg0/bn", "bev_encoder.seg_head.1")
    p.conv("bev_encoder/seg1/conv", "bev_encoder.seg_head.3", bias=True)
    p.bn("bev_encoder/seg1/bn", "bev_encoder.seg_head.4")
    p.conv("bev_encoder/seg_out", "bev_encoder.seg_head.6", bias=True)
    # TXT branch
    add_convbnrelu_seq(p, "feature_pyramid/scale1", "feature_pyramid.scale1")
    add_convbnrelu_seq(p, "feature_pyramid/scale2", "feature_pyramid.scale2")
    add_convbnrelu_seq(p, "feature_pyramid/fusion", "feature_pyramid.fusion")
    add_sceneunder(p, "sceneunder", "sceneunder")
    if use_camera_attn:
        p.copy("camera_transformer/cam_embed/embedding", "camera_transformer.cam_embed.weight")
        p.mha("camera_transformer/self_attn", "camera_transformer.self_attn")
        p.layernorm("camera_transformer/norm1", "camera_transformer.norm1")
        p.layernorm("camera_transformer/norm2", "camera_transformer.norm2")
        p.linear("camera_transformer/ffn0", "camera_transformer.ffn.0")
        p.linear("camera_transformer/ffn1", "camera_transformer.ffn.3")
    if use_cross_attn:
        p.mha("bev_fusion/cross_attn", "bev_fusion.cross_attn")
        p.layernorm("bev_fusion/norm", "bev_fusion.norm")
    p.copy("unified_predictor/camera_weights", "unified_predictor.camera_weights")
    p.linear("unified_predictor/enc0", "unified_predictor.encoder.0")
    p.layernorm("unified_predictor/enc_norm0", "unified_predictor.encoder.1")
    p.linear("unified_predictor/enc1", "unified_predictor.encoder.4")
    p.layernorm("unified_predictor/enc_norm1", "unified_predictor.encoder.5")
    p.linear("unified_predictor/action_head", "unified_predictor.action_head")
    p.linear("unified_predictor/desc_head", "unified_predictor.desc_head")


# ---------------------------------------------------------------- checkpoint files
def load_reference_checkpoint(path: str):
    """Load any of the reference's three checkpoint formats into ONE flat
    torch-key -> ndarray dict plus metadata:

      1. bare ``model.state_dict()``                    (train.py:93-95,
         pre_train.py:84-86);
      2. component-wise ``{X}_state_dict`` for X in backbone/depth_net/
         cam_encode/bev_encoder (+epoch/miou/optimizer)  (pre_train_vovnet.py:
         465-477) — component keys are re-prefixed ``X.<key>`` so they line up
         with the full-model porter mappings (consumed at
         train_vovnet_transformer.py:430-449);
      3. full training state ``model_state_dict`` + optimizer/scheduler/
         scaler/epoch/best_miou                        (train_vovnet_transformer.py:
         573-594). Only the model weights are portable — torch Adam moments are
         keyed by parameter *position*, not name, and the GradScaler has no
         bf16 counterpart; the metadata is returned for logging.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    meta: Dict[str, Any] = {"format": "flat"}

    def to_np(sd):
        return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}

    if isinstance(obj, dict) and "model_state_dict" in obj:
        meta["format"] = "full_state"
        for k in ("epoch", "best_miou", "miou", "lss_version"):
            if k in obj:
                meta[k] = obj[k]
        return to_np(obj["model_state_dict"]), meta
    comp_keys = [k for k in obj if isinstance(k, str) and k.endswith("_state_dict")
                 and k != "optimizer_state_dict"] if isinstance(obj, dict) else []
    if comp_keys:
        meta["format"] = "components"
        meta["components"] = [k[: -len("_state_dict")] for k in comp_keys]
        for k in ("epoch", "miou", "lss_version"):
            if k in obj:
                meta[k] = obj[k]
        flat = {}
        for ck in comp_keys:
            comp = ck[: -len("_state_dict")]
            flat.update({f"{comp}.{k}": v for k, v in to_np(obj[ck]).items()})
        return flat, meta
    return to_np(obj), meta


def port_checkpoint_file(path: str, family: str, strict: bool = False, **kw):
    """One-shot: reference torch checkpoint -> (params, batch_stats, report).

    report = {"format", "missing" (torch keys the mapping wanted but the file
    lacks — expected for component-wise warm starts), "unmapped" (file keys no
    rule consumed — e.g. the dead `sceneunder` in model_baseline.BEV_TXT),
    plus any checkpoint metadata}.
    """
    sd, meta = load_reference_checkpoint(path)
    porter = build_porter(family, **kw)
    params, batch_stats, missing = porter.run(sd, strict=strict)
    consumed = {tkey for _, tkey, _ in porter.rules}
    unmapped = sorted(
        k for k in sd if k not in consumed and "num_batches_tracked" not in k
    )
    report = dict(meta, missing=sorted(missing), unmapped=unmapped)
    return params, batch_stats, report


# ---------------------------------------------------------------- entry points
def build_porter(family: str, **kw) -> Porter:
    p = Porter()
    if family == "lss":
        add_lss(p, "", "", kw.get("variant", "b4"))
    elif family == "bev_txt":
        add_bev_txt(p, kw.get("variant", "b4"))
    elif family == "bev_txt_onlybev":
        add_bev_txt_onlybev(p, kw.get("variant", "b4"))
    elif family == "vovnet_transformer":
        add_vovnet_transformer(p, **kw)
    else:
        raise ValueError(family)
    return p


def port_state_dict(family: str, state_dict: Dict[str, np.ndarray], strict=True, **kw):
    return build_porter(family, **kw).run(state_dict, strict=strict)


def state_dict_from_torch_file(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: v.detach().numpy() for k, v in obj.items() if hasattr(v, "detach")}
