"""Model factories mirroring the reference compile_model_* entry points
(model_baseline.py:293-296, model_BEV_TXT.py:337-340,
model_vovnet_transformer.py:642-687)."""
from __future__ import annotations

import jax.numpy as jnp

from ..config import Config


def build_model(cfg: Config):
    family = cfg.model.family
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    if family == "lss":
        from .lss import LSS

        return LSS(cfg, dtype=dtype)
    if family == "bev_txt":
        from .bev_txt import BevTxt

        return BevTxt(cfg, dtype=dtype)
    if family == "bev_txt_onlybev":
        from .bev_txt import BevTxtOnlyBev

        return BevTxtOnlyBev(cfg, dtype=dtype)
    if family == "vovnet_transformer":
        from .vovnet_transformer import VoVNetBEVTransformer

        return VoVNetBEVTransformer(cfg, dtype=dtype)
    if family == "vovnet_pretrain":
        from .vovnet_pretrain import VoVNetPreTrain

        return VoVNetPreTrain(cfg, dtype=dtype)
    raise ValueError(f"unknown model family: {family}")


def with_family(cfg: Config, family: str) -> Config:
    import dataclasses

    return dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, family=family))
