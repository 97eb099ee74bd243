"""Multi-task BEV + explanation models (stack A).

Two variants, matching the reference exactly:
  * `BevTxt` — the paper model (src/model_BEV_TXT.py:143-334): BEV branch as
    LSS, TXT branch reads ASPP'd camera features per camera plus a *detached*
    BEV crop. CAM_BACK (index 4) is intentionally unused by the TXT branch
    (Appendix B quirk — affects desc output layout).
  * `BevTxtOnlyBev` — the BEV-only ablation (src/model_baseline.py:143-290):
    act/desc are read directly from the BEV crop, which is NOT detached.
    (The reference also constructs a never-called SceneUnder there — dead
    code we deliberately drop; the weight porter tolerates the extra keys.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..nn.layers import Dtype
from ..nn.lss_modules import (
    BevPost,
    EmbedderConv,
    EmbedderFlat,
    Predictor,
    SceneUnder,
)
from .lss import LSS

# BEV crop consumed by the TXT branch (reference model_BEV_TXT.py:286):
# rows 60:140 of X, cols 56:144 of Y -> (80, 88).
CROP_X = (60, 140)
CROP_Y = (56, 144)


class BevTxtOnlyBev(nn.Module):
    """BEV-only multitask variant. Returns (bev, act, desc)."""

    cfg: Config
    dtype: Dtype = jnp.float32

    def setup(self):
        self.lss = LSS(self.cfg, dtype=self.dtype, name="lss")
        self.bevpost = BevPost(dtype=self.dtype, name="bevpost")
        self.embeder_bev = EmbedderFlat(8, dtype=self.dtype, name="embeder_bev")
        self.predictor_bev1 = Predictor(
            self.cfg.model.num_action_classes, dtype=self.dtype, name="predictor_bev1"
        )
        self.predictor_bev2 = Predictor(
            self.cfg.model.num_desc_classes, dtype=self.dtype, name="predictor_bev2"
        )

    def __call__(self, imgs, rots, trans, intrins, post_rots, post_trans, train: bool = False):
        bev = self.lss(imgs, rots, trans, intrins, post_rots, post_trans, train)
        # NOT detached (reference model_baseline.py:283) — TXT grads flow to BEV
        crop = bev[:, CROP_X[0] : CROP_X[1], CROP_Y[0] : CROP_Y[1], :]
        post = self.bevpost(crop, train)
        emb = self.embeder_bev(post, train)
        act = self.predictor_bev1(emb)
        desc = self.predictor_bev2(emb)
        return bev, act, desc


class BevTxt(nn.Module):
    """The published two-branch model. Returns (bev, act, desc)."""

    cfg: Config
    dtype: Dtype = jnp.float32

    def setup(self):
        self.lss = LSS(self.cfg, dtype=self.dtype, name="lss")
        self.sceneunder = SceneUnder(dtype=self.dtype, name="sceneunder")
        self.bevpost = BevPost(dtype=self.dtype, name="bevpost")
        self.embeder_f1 = EmbedderConv(32, dtype=self.dtype, name="embeder_f1")
        self.embeder_f2 = EmbedderFlat(40, dtype=self.dtype, name="embeder_f2")
        self.embeder_lr1 = EmbedderConv(32, dtype=self.dtype, name="embeder_lr1")
        self.embeder_lr2 = EmbedderFlat(40, dtype=self.dtype, name="embeder_lr2")
        self.predictorf1 = Predictor(4, dtype=self.dtype, name="predictorf1")
        self.predictorf2 = Predictor(4, dtype=self.dtype, name="predictorf2")
        self.predictorlr = Predictor(1, dtype=self.dtype, name="predictorlr")

    def txt_branch(self, bev, cam_feats, train: bool = False):
        """TXT branch: (bev (B,X,Y,4), cam_feats (B*N,fh,fw,512)) -> (act, desc).

        The BEV crop is detached here: no TXT->BEV gradient (reference
        model_BEV_TXT.py:285).
        """
        b = bev.shape[0]
        n = cam_feats.shape[0] // b
        crop = jax.lax.stop_gradient(bev)[
            :, CROP_X[0] : CROP_X[1], CROP_Y[0] : CROP_Y[1], :
        ]
        bev_post = self.bevpost(crop, train)  # (B, 8, 22, 8)

        y1 = self.sceneunder(cam_feats, train)  # (B*N, fh, fw, 256)
        y1 = y1.reshape(b, n, y1.shape[1], y1.shape[2], -1)
        # camera order: FL F FR BL B BR; CAM_BACK (4) unused
        y_fl, y_f, y_fr, y_bl, y_br = (
            y1[:, 0], y1[:, 1], y1[:, 2], y1[:, 3], y1[:, 5]
        )

        def side(cam):
            e = self.embeder_lr1(cam, train)
            e = jnp.concatenate([e, bev_post], axis=-1)
            e = self.embeder_lr2(e, train)
            return self.predictorlr(e)  # (B, 1)

        yf = self.embeder_f1(y_f, train)
        yf = jnp.concatenate([yf, bev_post], axis=-1)
        yf = self.embeder_f2(yf, train)
        desc_f = self.predictorf1(yf)  # (B, 4)
        act = self.predictorf2(yf)  # (B, 4)

        # concat order preserved from reference model_BEV_TXT.py:332:
        # [desc_f, FL, BL, FR, BR]
        desc = jnp.concatenate(
            [desc_f, side(y_fl), side(y_bl), side(y_fr), side(y_br)], axis=-1
        )
        return act, desc

    def __call__(self, imgs, rots, trans, intrins, post_rots, post_trans, train: bool = False):
        b, n = imgs.shape[0], imgs.shape[1]

        # shared camera features (B*N, fh, fw, 512)
        x = imgs.reshape(b * n, *imgs.shape[2:])
        cam_feats = self.lss.encoder(x, train)

        # ---- BEV branch ----
        depth, feat = self.lss.lift(cam_feats, b, n, train)
        vox = self.lss.splat(feat, depth, rots, trans, intrins, post_rots, post_trans)
        bev = self.lss.bevencode(vox, train)

        act, desc = self.txt_branch(bev, cam_feats, train)
        return bev, act, desc
