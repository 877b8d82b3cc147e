#!/usr/bin/env python3
"""Diagnose the train/eval gap: decouple sampling mode from BN-stat mode."""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import jax
import jax.numpy as jnp

from accuracy_smoke import make_forest
from pointstowood_tpu.config import TilingConfig, TrainConfig
from pointstowood_tpu.data.dataset import TileBatcher
from pointstowood_tpu.data.tiling import preprocess_cloud
from pointstowood_tpu.io.loader import canonicalize_columns
from pointstowood_tpu.train.metrics import batch_metrics, binary_counts
from pointstowood_tpu.train.trainer import _batch_arrays, make_optimizer, make_train_step
from pointstowood_tpu.model import Net


def main():
    tiling = TilingConfig(grid_size=(4.0,), min_pts=128, max_pts=8192)
    df, _, _ = canonicalize_columns(make_forest(seed=1, n_trees=2), mode="train")
    tiles = preprocess_cloud(df, tiling, with_labels=True)[:8]
    cfg = TrainConfig(num_epochs=60, batch_size=4, learning_rate=2e-3)
    net = Net(channels=16, dtype=jnp.bfloat16)
    batches = list(TileBatcher(tiles, batch_size=4, min_pts=128, max_pts=8192,
                               with_labels=True, bucket=False))
    a0 = _batch_arrays(batches[0][1])
    variables = jax.jit(functools.partial(net.init, training=True))(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, *a0[:4]
    )
    tx = make_optimizer(cfg)
    params, bs = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    step = make_train_step(net, tx, cfg)
    key = jax.random.key(5)
    for epoch in range(60):
        for cap, b, _ in batches:
            key, sk = jax.random.split(key)
            params, bs, opt_state, loss, counts, finite = step(
                params, bs, opt_state, *_batch_arrays(b), jnp.float32(2e-3), sk)

    @functools.partial(jax.jit, static_argnames=("training", "ura"))
    def fwd_counts(params, bs, pos, refl, mask, sf, labels, key,
                   training: bool, ura: bool):
        kwargs = dict(training=training, use_running_average=ura)
        rngs = {"sample": key} if training else None
        if ura:
            logits = net.apply({"params": params, "batch_stats": bs},
                               pos, refl, mask, sf, rngs=rngs, **kwargs)
        else:  # batch stats get "updated"; discard the mutation
            logits, _ = net.apply({"params": params, "batch_stats": bs},
                                  pos, refl, mask, sf, rngs=rngs,
                                  mutable=["batch_stats"], **kwargs)
        preds = (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.float32)
        return binary_counts(preds, labels, mask)

    variants = {
        "train-sample + batch-stats (train metric)": (True, False),
        "train-sample + running-stats": (True, True),
        "voxel-sample + batch-stats": (False, False),
        "voxel-sample + running-stats (eval path)": (False, True),
    }
    def report(bs_used, suffix=""):
        for name, (tr, ura) in variants.items():
            agg = np.zeros(4)
            kk = jax.random.key(77)
            for cap, b, _ in batches:
                kk, sk = jax.random.split(kk)
                arr = _batch_arrays(b)
                agg += np.asarray(fwd_counts(params, bs_used, *arr, sk, tr, ura))
            m = batch_metrics(agg)
            print(f"{name}{suffix}: ba {m['balanced_accuracy']:.3f} f1 {m['f1']:.3f}")

    report(bs)
    from pointstowood_tpu.train.trainer import recalibrate_batch_stats

    bs2 = recalibrate_batch_stats(net, params, bs, tiles, cfg, tiling)
    report(bs2, " [recalibrated]")


if __name__ == "__main__":
    main()
