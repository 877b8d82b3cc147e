#!/usr/bin/env python3
"""A/B jax.checkpoint (remat) policies on the training loss at the
canonical shape. The backward's elementwise/BN share is HBM-bandwidth
bound: saving only matmul outputs and recomputing elementwise in the
backward can beat storing + reloading the big (B,S,k,C) intermediates.

Variants:
  none            — shipped behavior (save everything)
  dots            — jax.checkpoint_policies.dots_with_no_batch_dims_saveable
  dots_any        — checkpoint_dots (batch dims saveable)
  nothing         — full remat (recompute the whole forward)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B, N = 8, 16384
read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / 5
    print(f"{label:44s} {dt * 1000:8.2f} ms  {B * N / dt:,.0f} pts/s",
          flush=True)
    return dt


def main():
    from pointstowood_tpu.config import TrainConfig
    from pointstowood_tpu.model import Net
    from pointstowood_tpu.train.loss import poly1_focal_loss

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

    def loss_fn(params, batch_stats, pos, refl, mask, sf, labels, key):
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

    policies = {
        "none": None,
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots_any": jax.checkpoint_policies.checkpoint_dots,
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }
    for name, pol in policies.items():
        f = loss_fn if pol is None else jax.checkpoint(loss_fn, policy=pol)
        grad_fn = jax.jit(jax.grad(f))
        try:
            bench(grad_fn, params, batch_stats, pos, refl, mask, sf, labels,
                  key, label=f"grads remat={name}")
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"grads remat={name}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
