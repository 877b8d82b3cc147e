"""--is-wood threshold sweep over a labeled cloud.

BASELINE config 2 calls for an is-wood 0.50 threshold sweep on a single
tree. The classifier forward is threshold-independent (thresholding
happens on the sigmoid probabilities, reference predicter.py:202, and
again inside the fusion vote), so the sweep classifies once and re-runs
only the kNN fusion per threshold, reporting metrics against a ``truth``
column when present.

Run: python -m pointstowood_tpu.tools.threshold_sweep cloud.ply
     --model model.ckpt --thresholds 0.3 0.4 0.5 0.6 0.7
"""

from __future__ import annotations

import argparse

import numpy as np


def sweep(classified: np.ndarray, pc, thresholds, any_wood: float = 1.0):
    """Yield (threshold, labels (N,2)) re-fusing cached per-point probs.

    ``classified`` columns are [x, y, z, pred, prob]; fuse_labels derives
    predictions from prob >= is_wood itself, so each sweep step only
    re-runs the median/vote math over the shared neighbor indices.
    """
    from pointstowood_tpu.predict.fusion import fuse_labels, knn_indices

    query = pc[["x", "y", "z"]].to_numpy()
    k = 64 if any_wood == 1 else 32
    k = min(k, classified.shape[0])
    indices = knn_indices(classified[:, :3], query, k)  # shared across sweeps
    for t in thresholds:
        yield t, fuse_labels(classified, query, is_wood=t, any_wood=any_wood,
                             indices=indices)


def main(argv=None):
    from sklearn.metrics import balanced_accuracy_score, f1_score

    from pointstowood_tpu.config import ModelConfig, PredictConfig, TilingConfig
    from pointstowood_tpu.data.tiling import preprocess_cloud
    from pointstowood_tpu.io import load_file
    from pointstowood_tpu.io.loader import canonicalize_columns
    from pointstowood_tpu.predict.predicter import build_net, run_inference
    from pointstowood_tpu.utils.checkpoint import load_checkpoint

    p = argparse.ArgumentParser()
    p.add_argument("point_cloud")
    p.add_argument("--model", required=True)
    p.add_argument("--thresholds", type=float, nargs="+",
                   default=[0.3, 0.4, 0.5, 0.6, 0.7])
    p.add_argument("--grid_size", type=float, nargs="+", default=[2.0, 4.0])
    p.add_argument("--min_pts", type=int, default=128)
    p.add_argument("--max_pts", type=int, default=16384)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--channels", type=int, default=32)
    p.add_argument("--any-wood", type=float, default=1.0)
    args = p.parse_args(argv)

    pc_raw = load_file(args.point_cloud)
    truth = pc_raw["truth"].to_numpy() if "truth" in pc_raw.columns else None
    pc, _, _ = canonicalize_columns(pc_raw, mode="predict")
    tiling = TilingConfig(grid_size=tuple(args.grid_size),
                          min_pts=args.min_pts, max_pts=args.max_pts)
    model_cfg = ModelConfig(channels=args.channels)
    tiles = preprocess_cloud(pc, tiling)
    variables = load_checkpoint(args.model)
    net = build_net(model_cfg)
    classified = run_inference(
        tiles, variables, net, PredictConfig(batch_size=args.batch_size), tiling
    )
    print("threshold  wood_frac" + ("  balanced_acc  f1" if truth is not None else ""))
    for t, labels in sweep(classified, pc, args.thresholds,
                           any_wood=getattr(args, "any_wood")):
        frac = labels[:, 0].mean()
        line = f"{t:9.2f}  {frac:9.3f}"
        if truth is not None:
            ba = balanced_accuracy_score(truth > 0, labels[:, 0] > 0)
            f1 = f1_score(truth > 0, labels[:, 0] > 0, zero_division=0)
            line += f"  {ba:12.3f}  {f1:.3f}"
        print(line)


if __name__ == "__main__":
    main()
