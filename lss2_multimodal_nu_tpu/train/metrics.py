"""Evaluation metrics: confusion matrix (jnp, psum-reducible) and F1 scores
(reference src/tools.py:536-585, 288-342)."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix_update(
    mat: jnp.ndarray, labels: jnp.ndarray, preds: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Accumulate an (n, n) int32 confusion matrix (tools.py:541-551).
    Pure function — accumulate across steps by summing; across a mesh the
    sum over the batch-sharded axis IS the psum (jit inserts it)."""
    labels = labels.reshape(-1)
    preds = preds.reshape(-1)
    k = (labels >= 0) & (labels < num_classes)
    inds = jnp.where(k, num_classes * labels + preds, num_classes * num_classes)
    counts = jnp.zeros(num_classes * num_classes + 1, dtype=jnp.int32).at[inds].add(1)
    return mat + counts[:-1].reshape(num_classes, num_classes)


def confusion_matrix_compute(mat: np.ndarray) -> Dict[str, np.ndarray]:
    """(global acc, per-class acc, per-class IoU, mean IoU) — tools.py:557-565."""
    h = mat.astype(np.float64)
    diag = np.diag(h)
    acc_global = diag.sum() / h.sum()
    acc = diag / h.sum(1)
    iu = diag / (h.sum(1) + h.sum(0) - diag)
    return {
        "acc_global": acc_global,
        "acc": acc,
        "iou": iu,
        "mean_iou": np.nanmean(iu),
    }


def format_confusion(mat: np.ndarray) -> str:
    """Reference ConfusionMatrix.__str__ format (tools.py:575-585)."""
    m = confusion_matrix_compute(mat)
    return (
        "global correct: {:.1f}\n"
        "average row correct: {}\n"
        "IoU: {}\n"
        "mean IoU: {:.1f}".format(
            m["acc_global"] * 100,
            ["{:.1f}".format(i) for i in (m["acc"] * 100).tolist()],
            ["{:.1f}".format(i) for i in (m["iou"] * 100).tolist()],
            m["mean_iou"] * 100,
        )
    )


def binary_f1(targets: np.ndarray, preds: np.ndarray) -> float:
    """sklearn f1_score(binary) for 0/1 arrays: 2TP / (2TP + FP + FN)."""
    targets = np.asarray(targets).astype(bool)
    preds = np.asarray(preds).astype(bool)
    tp = np.sum(targets & preds)
    fp = np.sum(~targets & preds)
    fn = np.sum(targets & ~preds)
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom else 0.0


def macro_f1(targets: np.ndarray, preds: np.ndarray) -> float:
    """sklearn f1_score(average='macro') over the two classes {0, 1} of a
    flattened binary problem — what get_val_info_new computes (tools.py:337)."""
    f1_pos = binary_f1(targets, preds)
    f1_neg = binary_f1(1 - np.asarray(targets), 1 - np.asarray(preds))
    return (f1_pos + f1_neg) / 2.0


def per_class_and_macro_f1(
    targets: np.ndarray, preds: np.ndarray
) -> Tuple[np.ndarray, float, float]:
    """Reference eval (tools.py:332-342): per-class binary F1 over column i,
    overall macro-F1 over the flattened matrix, and the per-class mean.

    targets/preds: (N, C) 0/1 arrays. Returns (per_class (C,), overall, mean).
    """
    targets = np.asarray(targets)
    preds = np.asarray(preds)
    c = targets.shape[1]
    per = np.array([binary_f1(targets[:, i], preds[:, i]) for i in range(c)])
    overall = macro_f1(targets.reshape(-1), preds.reshape(-1))
    return per, overall, float(per.mean())
