#!/usr/bin/env python3
"""C=32 flagship accuracy proof + fast-vs-exact kNN deviation at plot
scale (VERDICT r2 item 5).

Phase 1: train the flagship C=32 backbone on the synthetic forest with
the production fast-kNN defaults, report held-out balanced accuracy (the
C=16 analogue lives in accuracy_smoke.py).

Phase 2: run the SAME checkpoint over a held-out multi-tree plot twice —
knn_mode='fast' (production default, recall 0.9 target) vs
knn_mode='exact' (parity path) — and report post-fusion label agreement
and |d pwood| percentiles: the kNN analogue of
scripts/tiling_deviation_experiment.py, and the justification for the
fast default at the flagship width.

Usage (TPU, hours-scale budget at the default 50 epochs):
  python scripts/c32_accuracy_and_knn_deviation.py --epochs 50
"""

import argparse
import dataclasses
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accuracy_smoke import make_forest  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--wdir", type=str, default=None)
    ap.add_argument("--test_trees", type=int, default=4)
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse wdir/model/c32.ckpt from a previous run")
    ap.add_argument("--recalls", type=str, default=None,
                    help="space-separated fast-kNN recall specs to sweep "
                         "(each a uniform value or per-stage "
                         "'sa1,sa2,sa3'), e.g. "
                         "'0.9 0.93 0.95 0.97 0.97,0.9,0.9'")
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
    from pointstowood_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    wdir = args.wdir or tempfile.mkdtemp(prefix="p2w_c32_")
    tiling = TilingConfig(grid_size=(2.0, 4.0), min_pts=128, max_pts=8192)
    model_cfg = ModelConfig(channels=args.channels)  # fast kNN defaults

    ckpt = os.path.join(wdir, "model", "c32.ckpt")
    if not args.skip_train or not os.path.exists(ckpt):
        train_df, _, _ = canonicalize_columns(make_forest(seed=1), mode="train")
        tiles = preprocess_cloud(train_df, tiling, with_labels=True)
        print(f"{len(tiles)} training tiles (C={args.channels}, "
              f"{args.epochs} epochs, fast kNN)", flush=True)
        t0 = time.time()
        semantic_training(
            tiles,
            TrainConfig(num_epochs=args.epochs, batch_size=8,
                        learning_rate=args.lr, augmentation=True),
            model_cfg, tiling, wdir=wdir, model_name="c32.ckpt",
            verbose=True,
        )
        print(f"training wall-clock: {time.time() - t0:.0f}s", flush=True)
    variables = load_checkpoint(ckpt)

    test_raw = make_forest(seed=99, n_trees=args.test_trees)
    truth = test_raw["truth"].to_numpy()

    # eval configs: the exact parity path + the fast path across the
    # recall frontier (VERDICT r3 item 3). A spec is a uniform recall
    # ("0.95") or per-SA-stage "sa1,sa2,sa3" ("0.97,0.9,0.9" — SA1 ranks
    # the full tile and dominates kNN latency, so tight-SA1/loose-rest is
    # the interesting corner).
    specs = [("exact", None)]
    for spec in (args.recalls.split() if args.recalls
                 else ["0.9"]):
        parts = tuple(float(x) for x in spec.split(","))
        specs.append(("fast", parts[0] if len(parts) == 1 else parts))

    results = {}
    for mode, recall in specs:
        df, _, _ = canonicalize_columns(
            test_raw.drop(columns=["truth"]).copy(), mode="predict"
        )
        tiles = preprocess_cloud(df, tiling, seed=141190)
        cfg = dataclasses.replace(model_cfg, knn_mode=mode)
        if recall is not None:
            cfg = dataclasses.replace(cfg, knn_recall=recall)
        key = mode if recall is None else f"fast@{recall}"
        t0 = time.time()
        out = semantic_segmentation(
            df, tiles, variables, cfg, PredictConfig(batch_size=8),
            tiling, verbose=False,
        )
        dt = time.time() - t0
        ba = balanced_accuracy_score(truth, out["label"].to_numpy())
        results[key] = (out, ba, dt)
        print(f"{key:22s}: BA vs truth {ba:.4f}  ({dt:.1f}s inference)",
              flush=True)

    exact_out, exact_ba, _ = results["exact"]
    print(f"\n-- frontier vs exact (BA {exact_ba:.4f}) --")
    for key, (out, ba, dt) in results.items():
        if key == "exact":
            continue
        la = np.mean(out["label"].to_numpy()
                     == exact_out["label"].to_numpy())
        dp = np.abs(out["pwood"].to_numpy()
                    - exact_out["pwood"].to_numpy())
        print(f"{key:22s}: BA {ba:.4f} (d {ba - exact_ba:+.4f})  "
              f"label agreement {la:.4f}  |d pwood| mean {dp.mean():.4f} "
              f"p99 {np.quantile(dp, 0.99):.4f}  {dt:.1f}s")
    print(f"wdir: {wdir}")


if __name__ == "__main__":
    main()
