#!/usr/bin/env python3
"""Quantify the xyz-only tiling deviation (VERDICT round-1 weak #4).

The reference clusters tiles on its FULL feature tensor
(reference: pointstowood/src/preprocessing.py:58 — voxel_grid(self.pos, size)
where self.pos = [x, y, z, reflectance, (label), n_z]), so reflectance and
height-band boundaries split cells beyond the intended spatial grid. Our
default clusters on xyz only. This experiment runs the SAME trained
checkpoint over both tilings of the same cloud and reports post-fusion
agreement — the quantity that decides whether the deviation gates the
"probabilities within tolerance" parity target.

Usage: python scripts/tiling_deviation_experiment.py [--epochs 12]
"""

import argparse
import dataclasses
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accuracy_smoke import make_forest  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--channels", type=int, default=16)
    args = ap.parse_args()

    from sklearn.metrics import balanced_accuracy_score

    from pointstowood_tpu.config import (
        ModelConfig, PredictConfig, TilingConfig, TrainConfig,
    )
    from pointstowood_tpu.data.tiling import preprocess_cloud
    from pointstowood_tpu.io.loader import canonicalize_columns
    from pointstowood_tpu.predict.predicter import semantic_segmentation
    from pointstowood_tpu.train.trainer import semantic_training
    from pointstowood_tpu.utils.checkpoint import load_checkpoint

    wdir = tempfile.mkdtemp(prefix="p2w_tiling_dev_")
    # dual-grid canonical shape, small capacity for experiment turnaround
    tiling_xyz = TilingConfig(grid_size=(2.0, 4.0), min_pts=128, max_pts=8192)
    tiling_full = dataclasses.replace(tiling_xyz, cluster_features=True)
    model_cfg = ModelConfig(channels=args.channels)

    train_df, _, _ = canonicalize_columns(make_forest(seed=1), mode="train")
    train_tiles = preprocess_cloud(train_df, tiling_xyz, with_labels=True)
    print(f"{len(train_tiles)} training tiles")
    semantic_training(
        train_tiles,
        TrainConfig(num_epochs=args.epochs, batch_size=8, learning_rate=1e-3,
                    augmentation=True),
        model_cfg, tiling_xyz, wdir=wdir, model_name="dev.ckpt", verbose=True,
    )
    variables = load_checkpoint(os.path.join(wdir, "model", "dev.ckpt"))

    test_raw = make_forest(seed=99, n_trees=2)
    truth = test_raw["truth"].to_numpy()
    results = {}
    for name, tiling in (("xyz", tiling_xyz), ("full", tiling_full)):
        df, _, _ = canonicalize_columns(
            test_raw.drop(columns=["truth"]).copy(), mode="predict"
        )
        tiles = preprocess_cloud(df, tiling, seed=141190)
        out = semantic_segmentation(
            df, tiles, variables, model_cfg, PredictConfig(batch_size=8),
            tiling, verbose=False,
        )
        ba = balanced_accuracy_score(truth, out["label"].to_numpy())
        sizes = np.array([len(t) for t in tiles])
        print(f"{name:5s}: {len(tiles)} tiles (median {np.median(sizes):.0f} "
              f"pts), BA vs truth {ba:.4f}")
        results[name] = out

    la = np.mean(
        results["xyz"]["label"].to_numpy() == results["full"]["label"].to_numpy()
    )
    dp = np.abs(
        results["xyz"]["pwood"].to_numpy() - results["full"]["pwood"].to_numpy()
    )
    print(f"label agreement xyz-vs-full: {la:.4f}")
    print(f"|dpwood| mean {dp.mean():.4f}  p99 {np.quantile(dp, 0.99):.4f} "
          f"max {dp.max():.4f}")


if __name__ == "__main__":
    main()
