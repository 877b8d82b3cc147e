#!/usr/bin/env python3
"""A/B the fusion stage-2 recall target on the bench plot with a
structured probability field: label agreement + |d pwood| of r=0.7/0.8
vs the r=0.9 default, and the per-run fusion wall time. Decides whether
FUSION_RECALL can drop (the median/vote over >=32 probability-duplicated
candidates tolerates swapped boundary neighbors)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd

import bench
from pointstowood_tpu.config import TilingConfig
from pointstowood_tpu.data.dataset import TileBatcher
from pointstowood_tpu.data.tiling import preprocess_cloud
from pointstowood_tpu.io.loader import canonicalize_columns
from pointstowood_tpu.predict import tpu_fusion


def main():
    rng = np.random.default_rng(7)
    xs, rs = [], []
    n_trees = 40
    side = max(np.sqrt(n_trees / 0.1), 4.0)
    centers = []
    for _ in range(n_trees):
        xyz, refl = bench.tree_points(rng, 25_000, height=8.0)
        off = np.array([rng.uniform(0, side), rng.uniform(0, side), 0.0],
                       np.float32)
        centers.append(off[:2])
        xs.append(xyz + off)
        rs.append(refl)
    df = pd.DataFrame({
        "x": np.concatenate(xs)[:, 0], "y": np.concatenate(xs)[:, 1],
        "z": np.concatenate(xs)[:, 2],
        "scalar_Refl": np.concatenate(rs),
    })
    pc, _, _ = canonicalize_columns(df, mode="predict")
    cfg = TilingConfig()
    tiles = preprocess_cloud(pc, cfg)
    order = TileBatcher(tiles, batch_size=8, min_pts=cfg.min_pts,
                        max_pts=cfg.max_pts).tile_order()
    cls_xyz = np.concatenate([tiles[t].points[:, :3] for t in order])
    q = pc[["x", "y", "z"]].to_numpy()

    # structured probabilities: wood near any trunk axis (sharp, like a
    # trained model), so the median/vote has realistic decision structure
    cen = np.stack(centers)
    d2 = ((cls_xyz[:, None, :2] - cen[None]) ** 2).sum(-1).min(1)
    prob = (1 / (1 + np.exp((np.sqrt(d2) - 0.35) * 12))).astype(np.float32)

    outs = {}
    for r in (0.9, 0.8, 0.7):
        tpu_fusion.FUSION_RECALL = r
        tpu_fusion._SHARDED_CACHE.clear()
        # the recall target is baked into the traced kernel; force a
        # retrace so the monkeypatched value takes effect
        tpu_fusion._fused_pair_knn.clear_cache()
        plan = tpu_fusion.plan_fusion(tiles, order, q, cfg.min_pts,
                                      cfg.max_pts)
        # warm (compiles) then timed
        tpu_fusion.fuse_on_device(tiles, order, prob, q, 0.5, 1.0,
                                  cfg.min_pts, cfg.max_pts, plan=plan)
        t0 = time.perf_counter()
        out = tpu_fusion.fuse_on_device(tiles, order, prob, q, 0.5, 1.0,
                                        cfg.min_pts, cfg.max_pts, plan=plan)
        dt = time.perf_counter() - t0
        outs[r] = out
        print(f"r={r}: fuse_on_device warm {dt:.2f}s")
    for r in (0.8, 0.7):
        agree = (outs[r][:, 0] == outs[0.9][:, 0]).mean()
        dp = np.abs(outs[r][:, 1] - outs[0.9][:, 1])
        print(f"r={r} vs r=0.9: label agreement {agree:.5f}, "
              f"|d pwood| mean {dp.mean():.5f} p99 {np.quantile(dp, .99):.4f}")


if __name__ == "__main__":
    main()
