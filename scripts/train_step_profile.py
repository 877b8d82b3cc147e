#!/usr/bin/env python3
"""Decompose the training step at the canonical shape (B=8, N=16384,
C=32, bf16): train-mode forward alone, forward+backward, and the full
engine step (AdamW + finite guard + metrics). VERDICT round-1 item 5.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

B = int(os.environ.get("TSP_B", 8))
N = int(os.environ.get("TSP_N", 16384))
ITERS = 5

read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:44s} {dt * 1000:8.2f} ms  {B * N / dt:,.0f} pts/s")
    return dt


def main():
    from pointstowood_tpu.config import TrainConfig
    from pointstowood_tpu.model import Net
    from pointstowood_tpu.train.loss import poly1_focal_loss
    from pointstowood_tpu.train.trainer import make_train_step

    cfg = TrainConfig()
    net = Net(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    refl = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    sf = jnp.asarray(
        np.linalg.norm(np.asarray(pos), axis=2).max(axis=1).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, (B, N)).astype(np.float32))
    key = jax.random.key(1)

    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, pos, refl, mask, sf
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def fwd_train(params, batch_stats, pos, refl, mask, sf, labels, key):
        logits, _ = net.apply(
            {"params": params, "batch_stats": batch_stats},
            pos, refl, mask, sf, training=True,
            rngs={"sample": key}, mutable=["batch_stats"],
        )
        loss, _ = poly1_focal_loss(
            logits, labels, epsilon=cfg.poly_epsilon, gamma=cfg.focal_gamma,
            alpha=None, label_smoothing=cfg.label_smoothing, mask=mask,
            reduction="mean",
        )
        return loss

    bench(fwd_train, params, batch_stats, pos, refl, mask, sf, labels, key,
          label="train-mode forward + loss")

    grad_fn = jax.jit(jax.grad(fwd_train))
    bench(grad_fn, params, batch_stats, pos, refl, mask, sf, labels, key,
          label="forward + backward (grads)")

    from pointstowood_tpu.train.trainer import make_optimizer
    tx = make_optimizer(cfg)
    opt_state = jax.jit(tx.init)(params)
    step = make_train_step(net, tx, cfg)
    bench(step, params, batch_stats, opt_state, pos, refl, mask, sf, labels,
          jnp.float32(1e-4), key, label="full train_step (engine)")


if __name__ == "__main__":
    main()
