"""Loss, schedule, metric, and augmentation tests against torch/sklearn oracles."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointstowood_tpu.train.loss import poly1_focal_loss
from pointstowood_tpu.train.metrics import batch_metrics, binary_counts
from pointstowood_tpu.train.schedule import cosine_warmup_restarts_lr, onecycle_cos_lr
from pointstowood_tpu.train.augmentation import augment_tile, rotate_3d


def _torch_poly1_focal(logits, labels, epsilon=0.1, gamma=2.0, alpha=None,
                       label_smoothing=0.1, eps=1e-6):
    """Independent torch oracle of the reference loss formula (loss.py:26-79)."""
    import torch
    import torch.nn.functional as F

    logits = torch.clamp(torch.tensor(logits), -10, 10)
    labels = torch.tensor(labels)
    if label_smoothing is not None:
        labels = labels * (1 - label_smoothing) + 0.5 * label_smoothing
    p = torch.clamp(torch.sigmoid(logits), eps, 1 - eps)
    ce = torch.clamp(
        F.binary_cross_entropy_with_logits(logits, labels, reduction="none"), max=100.0
    )
    pt = torch.clamp(labels * p + (1 - labels) * (1 - p), eps, 1 - eps)
    fw = torch.clamp((1 - pt) ** gamma, max=2.0)
    loss = fw * ce
    if alpha is not None:
        loss = (alpha * labels + (1 - alpha) * (1 - labels)) * loss
    poly = torch.clamp(epsilon * (1 - pt) ** (gamma + 1), max=100.0)
    loss = torch.clamp(loss + poly, 0.0, 100.0)
    loss = torch.where(torch.isnan(loss), torch.zeros_like(loss), loss)
    return loss.mean().item()


def test_loss_matches_torch_oracle(rng):
    logits = (rng.normal(size=256) * 8).astype(np.float32)
    labels = rng.integers(0, 2, 256).astype(np.float32)
    ours, gamma = jax.jit(
        lambda lo, la: poly1_focal_loss(lo, la, label_smoothing=0.1, reduction="mean")
    )(jnp.array(logits), jnp.array(labels))
    ref = _torch_poly1_focal(logits, labels)
    assert gamma == 2.0
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_loss_extreme_logits_clamped(rng):
    logits = np.array([1e4, -1e4, np.inf, -np.inf], np.float32)
    labels = np.array([0, 1, 1, 0], np.float32)
    loss, _ = jax.jit(lambda lo, la: poly1_focal_loss(lo, la, label_smoothing=0.1))(
        jnp.array(np.nan_to_num(logits, posinf=1e6, neginf=-1e6)), jnp.array(labels)
    )
    assert np.isfinite(float(loss)) and 0 <= float(loss) <= 100


def test_loss_masked(rng):
    logits = rng.normal(size=64).astype(np.float32)
    labels = rng.integers(0, 2, 64).astype(np.float32)
    mask = np.zeros(64, bool)
    mask[:40] = True
    full, _ = jax.jit(lambda lo, la: poly1_focal_loss(lo, la, label_smoothing=0.1))(
        jnp.array(logits[:40]), jnp.array(labels[:40])
    )
    masked, _ = jax.jit(
        lambda lo, la, m: poly1_focal_loss(lo, la, label_smoothing=0.1, mask=m)
    )(jnp.array(logits), jnp.array(labels), jnp.array(mask))
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)


def test_onecycle_matches_torch():
    import torch

    total = 40
    model = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1e-4, total_steps=total, pct_start=0.05,
        anneal_strategy="cos", div_factor=100,
    )
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    ours = [onecycle_cos_lr(s, max_lr=1e-4, total_steps=total) for s in range(total)]
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-6)


def test_cosine_warmup_restarts_matches_reference_semantics():
    """Oracle: an iterative reimplementation of the reference scheduler's
    step()/get_lr() state machine (cosine_scheduler.py:52-88) at the
    trainer's --tune settings (trainer.py:120)."""
    first_cycle, warmup, max_lr, min_lr, gamma = 10, 5, 1e-6, 1e-8, 0.5

    def oracle_sequence(n):
        # state per reference __init__: step_in_cycle=-1, then init_lr -> min
        lrs = []
        step_in_cycle, cycle = -1, 0
        lr = min_lr
        for _ in range(n):
            # step() advances, then sets lr (epoch=None branch)
            step_in_cycle += 1
            if step_in_cycle >= first_cycle:
                cycle += 1
                step_in_cycle -= first_cycle
            cur_max = max_lr * (gamma ** cycle)
            if step_in_cycle < warmup:
                lr = (cur_max - min_lr) * step_in_cycle / warmup + min_lr
            else:
                lr = min_lr + (cur_max - min_lr) * (
                    1 + math.cos(math.pi * (step_in_cycle - warmup) / (first_cycle - warmup))
                ) / 2
            lrs.append(lr)
        return lrs

    ref = oracle_sequence(25)
    ours = [
        cosine_warmup_restarts_lr(
            s, first_cycle_steps=first_cycle, max_lr=max_lr, min_lr=min_lr,
            warmup_steps=warmup, gamma=gamma,
        )
        for s in range(25)
    ]
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_metrics_match_sklearn(rng):
    from sklearn.metrics import (
        balanced_accuracy_score,
        f1_score,
        precision_score,
        recall_score,
    )

    y = rng.integers(0, 2, 500)
    p = rng.integers(0, 2, 500)
    counts = jax.jit(binary_counts)(jnp.array(p), jnp.array(y))
    m = batch_metrics(counts)
    assert m["precision"] == pytest.approx(precision_score(y, p, zero_division=0))
    assert m["recall"] == pytest.approx(recall_score(y, p, zero_division=0))
    assert m["f1"] == pytest.approx(f1_score(y, p, zero_division=0))
    assert m["balanced_accuracy"] == pytest.approx(balanced_accuracy_score(y, p))


def test_metrics_single_class_edge():
    from sklearn.metrics import balanced_accuracy_score, precision_score

    y = np.ones(10, int)
    p = np.ones(10, int)
    import warnings

    counts = jax.jit(binary_counts)(jnp.array(p), jnp.array(y))
    m = batch_metrics(counts)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert m["balanced_accuracy"] == pytest.approx(balanced_accuracy_score(y, p))
    assert m["precision"] == pytest.approx(precision_score(y, p, zero_division=0))


def test_rotation_preserves_norms(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    rot = rotate_3d(pts, rng)
    np.testing.assert_allclose(
        np.linalg.norm(rot, axis=1), np.linalg.norm(pts, axis=1), rtol=1e-4
    )


def test_augment_policy_probabilities():
    pts = np.ones((50, 4), np.float32)
    n_silenced = n_rotated = 0
    trials = 400
    for i in range(trials):
        rng = np.random.default_rng(i)
        out = augment_tile(pts, rng, mode="train")
        if (out[:, 3] == 0).all():
            n_silenced += 1
        if not np.allclose(out[:, :3], pts[:, :3]):
            n_rotated += 1
    assert 0.18 < n_silenced / trials < 0.32
    assert 0.18 < n_rotated / trials < 0.32
    # test mode never perturbs reflectance with noise (only silences)
    for i in range(100):
        rng = np.random.default_rng(i)
        out = augment_tile(pts, rng, mode="test")
        refl = out[:, 3]
        assert (refl == 0).all() or (refl == 1).all()
