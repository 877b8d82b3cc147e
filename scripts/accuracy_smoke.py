#!/usr/bin/env python3
"""End-to-end learning proof: train on a synthetic forest, predict a
held-out tree, report balanced accuracy. Run on TPU; expects BA >> 0.5.

Usage: python scripts/accuracy_smoke.py [--epochs 40] [--channels 16]
"""

import argparse
import os
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_forest(seed, n_trees=4, pts_per_tree=25000):
    # density matters: the backbone's neighborhood scales (4-16 cm) assume
    # TLS-like point spacing; sparse crowns leave stage-1 radius
    # neighborhoods empty and cap accuracy
    """Trees with cylindrical trunks + branch lines (wood) and diffuse
    crowns (leaf); reflectance weakly informative."""
    rng = np.random.default_rng(seed)
    frames = []
    for t in range(n_trees):
        cx, cy = rng.uniform(0, 30, 2)
        height = rng.uniform(8, 14)
        n_wood = pts_per_tree // 3
        n_leaf = pts_per_tree - n_wood
        # trunk
        theta = rng.uniform(0, 2 * np.pi, n_wood // 2)
        r = rng.uniform(0.05, 0.25, n_wood // 2)
        trunk = np.stack(
            [cx + r * np.cos(theta), cy + r * np.sin(theta),
             rng.uniform(0, height * 0.7, n_wood // 2)], 1,
        )
        # branches: radial line segments in the crown
        n_br = n_wood - n_wood // 2
        ang = rng.uniform(0, 2 * np.pi, n_br)
        tdist = rng.uniform(0, 2.0, n_br)
        bz = rng.uniform(height * 0.4, height * 0.9, n_br)
        branches = np.stack(
            [cx + tdist * np.cos(ang), cy + tdist * np.sin(ang), bz], 1
        ) + rng.normal(0, 0.02, (n_br, 3))
        crown = np.stack(
            [cx + rng.normal(0, 1.5, n_leaf), cy + rng.normal(0, 1.5, n_leaf),
             height * 0.65 + rng.normal(0, height * 0.2, n_leaf)], 1,
        )
        xyz = np.concatenate([trunk, branches, crown])
        refl = np.concatenate(
            [rng.normal(1.0, 0.6, n_wood), rng.normal(-0.5, 0.6, n_leaf)]
        )
        label = np.concatenate([np.ones(n_wood), np.zeros(n_leaf)])
        frames.append(pd.DataFrame(
            {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
             "reflectance": refl, "truth": label}))
    return pd.concat(frames, ignore_index=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--wdir", type=str, default=None)
    args = ap.parse_args()

    from pointstowood_tpu.config import ModelConfig, PredictConfig, TilingConfig, TrainConfig
    from pointstowood_tpu.data.tiling import preprocess_cloud
    from pointstowood_tpu.io.loader import canonicalize_columns
    from pointstowood_tpu.predict.predicter import semantic_segmentation
    from pointstowood_tpu.train.trainer import semantic_training
    from pointstowood_tpu.utils.checkpoint import load_checkpoint
    from sklearn.metrics import balanced_accuracy_score

    wdir = args.wdir or tempfile.mkdtemp(prefix="p2w_smoke_")
    tiling = TilingConfig(grid_size=(4.0,), min_pts=128, max_pts=8192)
    model_cfg = ModelConfig(channels=args.channels)
    train_cfg = TrainConfig(
        num_epochs=args.epochs, batch_size=8, learning_rate=args.lr,
        augmentation=True,
    )

    train_df, _, _ = canonicalize_columns(make_forest(seed=1), mode="train")
    tiles = preprocess_cloud(train_df, tiling, with_labels=True)
    print(f"{len(tiles)} training tiles")

    state, history = semantic_training(
        tiles, train_cfg, model_cfg, tiling, wdir=wdir, model_name="smoke.ckpt",
        verbose=True,
    )

    test_df_raw = make_forest(seed=99, n_trees=2)
    truth = test_df_raw["truth"].to_numpy()
    test_df, _, _ = canonicalize_columns(
        test_df_raw.drop(columns=["truth"]), mode="predict"
    )
    test_tiles = preprocess_cloud(test_df, tiling)
    variables = load_checkpoint(os.path.join(wdir, "model", "smoke.ckpt"))
    out = semantic_segmentation(
        test_df, test_tiles, variables, model_cfg,
        PredictConfig(batch_size=8), tiling, verbose=True,
    )
    ba = balanced_accuracy_score(truth, out["label"].to_numpy())
    print(f"RESULT balanced_accuracy={ba:.4f}")
    if ba < 0.8:
        print("WARNING: below 0.8 — learning stack may have a problem")
    return ba


if __name__ == "__main__":
    main()
