"""Binary segmentation metrics with the reference's batchwise averaging.

The reference computes sklearn precision/recall/balanced-accuracy/F1 per
batch on CPU and averages across batches (reference:
pointstowood/src/trainer.py:198-202) — a mean of per-batch metrics, not a
pooled confusion matrix. ``binary_counts`` runs in-graph (jnp) and returns
the per-batch confusion counts; ``batch_metrics`` applies the sklearn
formulas (including zero_division=0 and balanced accuracy averaged over
classes present in y_true).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def binary_counts(preds, labels, mask=None):
    """(tp, fp, tn, fn, pos_present, neg_present) over valid points."""
    preds = preds.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    m = jnp.ones_like(labels) if mask is None else mask.astype(jnp.float32)
    tp = jnp.sum(m * preds * labels)
    fp = jnp.sum(m * preds * (1 - labels))
    tn = jnp.sum(m * (1 - preds) * (1 - labels))
    fn = jnp.sum(m * (1 - preds) * labels)
    return jnp.stack([tp, fp, tn, fn])


def batch_metrics(counts) -> dict:
    """sklearn-equivalent binary metrics from (tp, fp, tn, fn)."""
    tp, fp, tn, fn = [float(c) for c in np.asarray(counts)]
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    # balanced accuracy: mean recall over classes present in y_true
    recalls = []
    if (tp + fn) > 0:
        recalls.append(tp / (tp + fn))
    if (tn + fp) > 0:
        recalls.append(tn / (tn + fp))
    balanced_accuracy = float(np.mean(recalls)) if recalls else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "balanced_accuracy": balanced_accuracy,
    }
