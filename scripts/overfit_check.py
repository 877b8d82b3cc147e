#!/usr/bin/env python3
"""Capacity check: overfit a few tiles; train BA should approach 1.0 and the
eval path on the SAME tiles should match. Distinguishes model bugs from
task difficulty."""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import jax
import jax.numpy as jnp

from accuracy_smoke import make_forest
from pointstowood_tpu.config import ModelConfig, TilingConfig, TrainConfig
from pointstowood_tpu.data.dataset import TileBatcher
from pointstowood_tpu.data.tiling import preprocess_cloud
from pointstowood_tpu.io.loader import canonicalize_columns
from pointstowood_tpu.train.metrics import batch_metrics, binary_counts
from pointstowood_tpu.train.trainer import (
    _batch_arrays,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from pointstowood_tpu.model import Net


def main():
    tiling = TilingConfig(grid_size=(4.0,), min_pts=128, max_pts=8192)
    df, _, _ = canonicalize_columns(make_forest(seed=1, n_trees=2), mode="train")
    tiles = preprocess_cloud(df, tiling, with_labels=True)[:8]
    print(f"{len(tiles)} tiles, sizes {[len(t) for t in tiles]}")

    cfg = TrainConfig(num_epochs=150, batch_size=4, learning_rate=2e-3)
    net = Net(channels=16, dtype=jnp.bfloat16)
    batches = list(TileBatcher(tiles, batch_size=4, min_pts=128, max_pts=8192,
                               with_labels=True, bucket=False))
    cap0, b0, _ = batches[0]
    a0 = _batch_arrays(b0)
    variables = jax.jit(functools.partial(net.init, training=True))(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, *a0[:4]
    )
    tx = make_optimizer(cfg)
    params, bs = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    step = make_train_step(net, tx, cfg)
    eval_step = make_eval_step(net)
    key = jax.random.key(5)

    for epoch in range(1, 151):
        lr = jnp.float32(2e-3)
        agg = np.zeros(4)
        loss_sum, nb = 0.0, 0
        for cap, b, _ in batches:
            key, sk = jax.random.split(key)
            arr = _batch_arrays(b)
            params, bs, opt_state, loss, counts, finite = step(
                params, bs, opt_state, *arr, lr, sk)
            if not bool(finite):
                print(f"epoch {epoch}: NON-FINITE")
                continue
            agg += np.asarray(counts)
            loss_sum += float(loss)
            nb += 1
        if epoch % 25 == 0 or epoch == 1:
            m = batch_metrics(agg)
            print(f"epoch {epoch}: loss {loss_sum/max(nb,1):.4f} "
                  f"pooled train ba {m['balanced_accuracy']:.3f} f1 {m['f1']:.3f}")

    # eval path on the same tiles
    agg = np.zeros(4)
    for cap, b, _ in batches:
        arr = _batch_arrays(b)
        counts = eval_step(params, bs, *arr)
        agg += np.asarray(counts)
    m = batch_metrics(agg)
    print(f"EVAL-ON-TRAIN pooled ba {m['balanced_accuracy']:.3f} f1 {m['f1']:.3f}")


if __name__ == "__main__":
    main()
