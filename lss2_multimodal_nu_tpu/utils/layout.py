"""Layout-compat helpers for users porting NCHW (reference) eval code."""
from __future__ import annotations


def nhwc_to_nchw(x):
    """(B, H, W, C) -> (B, C, H, W) — e.g. our BEV logits to reference layout."""
    return x.transpose(0, 3, 1, 2) if hasattr(x, "transpose") else x


def nchw_to_nhwc(x):
    """(B, C, H, W) -> (B, H, W, C) — e.g. reference image batches to ours."""
    return x.transpose(0, 2, 3, 1) if hasattr(x, "transpose") else x


def imgs_bnchw_to_bnhwc(imgs):
    """(B, N, 3, H, W) reference camera batch -> (B, N, H, W, 3)."""
    return imgs.transpose(0, 1, 3, 4, 2)
