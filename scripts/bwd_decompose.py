#!/usr/bin/env python3
"""Decompose the full-net backward cost by ablation at the canonical
shape (B=8, N=16384, C=32, bf16).

Variants:
  full          real grad (baseline, = train_step_profile's fwd+bwd)
  no-scatter    gather_rows VJP returns zeros — removes every neighbor
                scatter-add from the backward
  remat-sa      jax.checkpoint around each SA stage (recompute vs HBM)

The difference full - no-scatter is the true in-context scatter cost; the
remainder is matmul/BN backward.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("BD_B", 8))
N = int(os.environ.get("BD_N", 16384))
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
    print(f"{label:36s} {dt * 1000:8.2f} ms")
    return dt


def main():
    from pointstowood_tpu.config import TrainConfig
    from pointstowood_tpu.model import Net
    from pointstowood_tpu.model import pointconv
    from pointstowood_tpu.train.loss import poly1_focal_loss

    cfg = TrainConfig()
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    refl = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    sf = jnp.asarray(
        np.linalg.norm(np.asarray(pos), axis=2).max(axis=1).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, (B, N)).astype(np.float32))
    key = jax.random.key(1)

    net = Net(dtype=jnp.bfloat16)
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, pos, refl, mask, sf
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    def make_loss(net):
        def fwd(params, batch_stats, pos, refl, mask, sf, labels, key):
            logits, _ = net.apply(
                {"params": params, "batch_stats": batch_stats},
                pos, refl, mask, sf, training=True,
                rngs={"sample": key}, mutable=["batch_stats"],
            )
            loss, _ = poly1_focal_loss(
                logits, labels, epsilon=cfg.poly_epsilon,
                gamma=cfg.focal_gamma, alpha=None,
                label_smoothing=cfg.label_smoothing, mask=mask,
                reduction="mean",
            )
            return loss
        return fwd

    loss_fn = make_loss(net)
    args = (params, batch_stats, pos, refl, mask, sf, labels, key)
    bench(jax.jit(loss_fn), *args, label="train fwd + loss")
    t_full = bench(jax.jit(jax.grad(loss_fn)), *args, label="grad full")

    # ablation: kill the gather VJP (scatter-adds) entirely
    orig = pointconv.gather_rows

    @jax.custom_vjp
    def gather_nograd(arr, idx):
        return orig(arr, idx)

    def _f(arr, idx):
        return orig(arr, idx), arr

    def _b(arr, ct):
        return jnp.zeros_like(arr), None

    gather_nograd.defvjp(_f, _b)
    pointconv.gather_rows = gather_nograd
    try:
        loss_fn2 = make_loss(Net(dtype=jnp.bfloat16))
        t_nos = bench(jax.jit(jax.grad(loss_fn2)), *args,
                      label="grad no-scatter (ablated)")
    finally:
        pointconv.gather_rows = orig
    print(f"-> in-context scatter-add cost: {(t_full - t_nos) * 1000:.2f} ms")

    # FP interpolate backward ablation: also kill interpolate's scatter
    from pointstowood_tpu.ops import interpolate as interp_mod
    print()


if __name__ == "__main__":
    main()
