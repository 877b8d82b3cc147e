"""Poly-1 focal loss on sigmoid logits.

Functional reimplementation of the reference Poly1FocalLoss
(reference: pointstowood/src/loss.py:6-79), including its stability
clamps: logits to [-10, 10], CE to <=100, focal weight to <=2, poly term to
<=100, final loss to [0, 100], NaN -> 0. The trainer instantiates it with
gamma=2, alpha=None, label_smoothing=0.1, reduction='mean'
(reference trainer.py:116).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_with_logits(logits, labels):
    """Numerically stable binary cross entropy with logits."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def poly1_focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    epsilon: float = 0.1,
    gamma: float = 2.0,
    alpha: float | None = None,
    label_smoothing: float | None = None,
    mask: jax.Array | None = None,
    reduction: str = "mean",
    eps: float = 1e-6,
):
    """Returns (loss, gamma) like the reference forward (loss.py:79)."""
    logits = jnp.clip(logits.astype(jnp.float32), -10.0, 10.0)
    labels = labels.astype(jnp.float32)
    if label_smoothing is not None:
        labels = labels * (1.0 - label_smoothing) + 0.5 * label_smoothing

    p = jnp.clip(jax.nn.sigmoid(logits), eps, 1.0 - eps)
    ce = jnp.clip(_bce_with_logits(logits, labels), max=100.0)
    pt = jnp.clip(labels * p + (1.0 - labels) * (1.0 - p), eps, 1.0 - eps)
    focal_weight = jnp.clip(jnp.power(1.0 - pt, gamma), max=2.0)
    loss = focal_weight * ce
    if alpha is not None:
        alpha_t = alpha * labels + (1.0 - alpha) * (1.0 - labels)
        loss = alpha_t * loss
    poly = jnp.clip(epsilon * jnp.power(1.0 - pt, gamma + 1.0), max=100.0)
    loss = jnp.clip(loss + poly, 0.0, 100.0)
    loss = jnp.where(jnp.isnan(loss), 0.0, loss)

    if mask is not None:
        m = mask.astype(loss.dtype)
        if reduction == "mean":
            loss = jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)
        elif reduction == "sum":
            loss = jnp.sum(loss * m)
        else:
            loss = loss * m
    else:
        if reduction == "mean":
            loss = jnp.mean(loss)
        elif reduction == "sum":
            loss = jnp.sum(loss)
    return loss, gamma
