"""Loss functions with the reference's exact class weights and torch
normalization semantics (reference src/tools.py:221-265,
train_vovnet_transformer.py:66-130).

All losses take NHWC BEV logits (B, X, Y, C) and int labels (B, X, Y);
act/desc logits (B, 4)/(B, 8) with float 0/1 targets. Device-agnostic
(the reference hard-codes .cuda(); dropped per Appendix B).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from jax import nn as jnn

# reference class weights
BEV_CLASS_WEIGHTS = (1.0, 10.0, 5.0, 10.0)  # tools.py:224
ACT_WEIGHTS = (1.0, 5.0, 5.0, 5.0)  # tools.py:242
DESC_WEIGHTS = (1.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 1.0)  # tools.py:244
ACT_WEIGHTS_NOBEV = (20.0, 250.0, 250.0, 250.0)  # tools.py:257
DESC_WEIGHTS_NOBEV = (20.0, 400.0, 400.0, 400.0, 20.0, 20.0, 20.0, 20.0)
ACT_POS_WEIGHT_V2 = (5.0, 5.0, 5.0, 5.0)  # train_vovnet_transformer.py:88
DESC_POS_WEIGHT_V2 = (5.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 1.0)  # :92


def weighted_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, class_weights
) -> jnp.ndarray:
    """torch nn.CrossEntropyLoss(weight=w): weighted mean normalized by the
    SUM OF SAMPLE WEIGHTS (not the count) — parity-critical detail.

    logits: (..., C) float; labels: (...) int.
    """
    logits = logits.astype(jnp.float32)  # losses always f32 (bf16 logits
    # would round the loss and its cotangent — selective-precision policy)
    w = jnp.asarray(class_weights, dtype=logits.dtype)
    logp = jnn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    sw = w[labels]
    return jnp.sum(nll * sw) / jnp.sum(sw)


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weight=None,
    pos_weight=None,
) -> jnp.ndarray:
    """torch F.binary_cross_entropy_with_logits: per-element weight scales the
    loss (plain mean afterwards); pos_weight scales only the positive term."""
    logits = logits.astype(jnp.float32)  # losses always f32
    targets = targets.astype(logits.dtype)
    log_sig = jnn.log_sigmoid(logits)
    log_one_minus = jnn.log_sigmoid(-logits)
    if pos_weight is not None:
        pw = jnp.asarray(pos_weight, dtype=logits.dtype)
        loss = -(pw * targets * log_sig + (1.0 - targets) * log_one_minus)
    else:
        loss = -(targets * log_sig + (1.0 - targets) * log_one_minus)
    if weight is not None:
        loss = loss * jnp.asarray(weight, dtype=logits.dtype)
    return jnp.mean(loss)


def simple_loss(bev_logits: jnp.ndarray, bev_labels: jnp.ndarray) -> jnp.ndarray:
    """SimpleLoss (tools.py:221-230): weighted CE over 4 BEV classes."""
    return weighted_cross_entropy(bev_logits, bev_labels, BEV_CLASS_WEIGHTS)


def multi_loss(
    bev_logits, act_logits, desc_logits, bev_labels, act_labels, desc_labels
) -> jnp.ndarray:
    """MultiLoss (tools.py:232-251): CE(bev) + BCE(act) + BCE(desc), unit sum."""
    return (
        weighted_cross_entropy(bev_logits, bev_labels, BEV_CLASS_WEIGHTS)
        + bce_with_logits(act_logits, act_labels, weight=ACT_WEIGHTS)
        + bce_with_logits(desc_logits, desc_labels, weight=DESC_WEIGHTS)
    )


def multi_loss_nobev(act_logits, desc_logits, act_labels, desc_labels) -> jnp.ndarray:
    """MultiLoss_nobev (tools.py:253-265): act/desc only, heavier weights."""
    return bce_with_logits(
        act_logits, act_labels, weight=ACT_WEIGHTS_NOBEV
    ) + bce_with_logits(desc_logits, desc_labels, weight=DESC_WEIGHTS_NOBEV)


def multi_task_loss(
    bev_logits,
    act_logits,
    desc_logits,
    bev_labels,
    act_labels,
    desc_labels,
    bev_weight: float = 1.0,
    action_weight: float = 0.5,
    desc_weight: float = 0.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """MultiTaskLoss (train_vovnet_transformer.py:66-130): task-balanced CE +
    pos_weight BCEs. Returns (total, components)."""
    loss_bev = weighted_cross_entropy(bev_logits, bev_labels, BEV_CLASS_WEIGHTS)
    loss_act = bce_with_logits(act_logits, act_labels, pos_weight=ACT_POS_WEIGHT_V2)
    loss_desc = bce_with_logits(
        desc_logits, desc_labels, pos_weight=DESC_POS_WEIGHT_V2
    )
    total = bev_weight * loss_bev + action_weight * loss_act + desc_weight * loss_desc
    return total, {"bev": loss_bev, "action": loss_act, "desc": loss_desc}


def cross_entropy_ignore(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255
) -> jnp.ndarray:
    """torch nn.CrossEntropyLoss(ignore_index=...) — unweighted mean over
    non-ignored pixels (reference pre_train_vovnet.py:373)."""
    logits = logits.astype(jnp.float32)  # losses always f32
    logp = jnn.log_softmax(logits, axis=-1)
    safe = jnp.where(labels == ignore_index, 0, labels)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    mask = (labels != ignore_index).astype(logits.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
