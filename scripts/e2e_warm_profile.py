#!/usr/bin/env python3
"""Phase breakdown of the WARM plot e2e (all shapes compiled): model,
TPU fusion index build, median/vote fuse. Finds the steady-state
bottleneck bench.py's single warm number hides."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_POINTS = int(os.environ.get("E2E_POINTS", 1_000_000))


def main():
    import bench
    import pandas as pd

    from pointstowood_tpu.config import ModelConfig, PredictConfig, TilingConfig
    from pointstowood_tpu.data.dataset import TileBatcher
    from pointstowood_tpu.data.tiling import preprocess_cloud
    from pointstowood_tpu.io.loader import canonicalize_columns
    from pointstowood_tpu.parallel.mesh import data_mesh
    from pointstowood_tpu.predict.predicter import (
        build_net, run_inference, semantic_segmentation,
    )

    _, variables, _ = bench.forward_benchmark()

    rng = np.random.default_rng(7)
    pts_per_tree = 25_000
    n_trees = max(N_POINTS // pts_per_tree, 1)
    side = max(np.sqrt(n_trees / 0.1), 4.0)
    xs, rs = [], []
    for _ in range(n_trees):
        xyz, refl = bench.tree_points(rng, pts_per_tree, height=8.0)
        off = np.array([rng.uniform(0, side), rng.uniform(0, side), 0.0],
                       np.float32)
        xs.append(xyz + off)
        rs.append(refl)
    df = pd.DataFrame({
        "x": np.concatenate(xs)[:, 0], "y": np.concatenate(xs)[:, 1],
        "z": np.concatenate(xs)[:, 2],
        "scalar_Refl": np.concatenate(rs),
    })
    pc, _, _ = canonicalize_columns(df, mode="predict")

    t0 = time.perf_counter()
    tiling_cfg = TilingConfig()
    tiles = preprocess_cloud(pc, tiling_cfg)
    t1 = time.perf_counter()
    print(f"preprocess: {t1 - t0:.2f}s ({len(tiles)} tiles)")

    model_cfg = ModelConfig()
    predict_cfg = PredictConfig()
    mesh = data_mesh()
    # cold pass compiles everything
    semantic_segmentation(pc, tiles, variables, model_cfg, predict_cfg,
                          tiling_cfg, mesh=mesh)
    print("cold pass done; timing warm phases")

    net = build_net(model_cfg)
    t2 = time.perf_counter()
    classified = run_inference(tiles, variables, net, predict_cfg,
                               tiling_cfg, mesh=mesh)
    t3 = time.perf_counter()
    print(f"model phase (warm): {t3 - t2:.2f}s "
          f"({classified.shape[0]} rows)")

    order = TileBatcher(tiles, batch_size=predict_cfg.batch_size,
                        min_pts=tiling_cfg.min_pts,
                        max_pts=tiling_cfg.max_pts).tile_order()
    source_xyz = np.concatenate([tiles[t].points[:, :3] for t in order])
    query_xyz = pc[["x", "y", "z"]].to_numpy()
    from pointstowood_tpu.predict.tpu_fusion import fuse_on_device

    t4 = time.perf_counter()
    fused = fuse_on_device(
        tiles, order, classified[:, -1].astype(np.float32), query_xyz,
        0.5, 1.0, tiling_cfg.min_pts, tiling_cfg.max_pts, verbose=True,
    )
    t5 = time.perf_counter()
    print(f"on-device fusion (warm): {t5 - t4:.2f}s "
          f"(wood frac {fused[:, 0].mean():.3f})")

    t6 = time.perf_counter()
    out = semantic_segmentation(pc, tiles, variables, model_cfg,
                                predict_cfg, tiling_cfg, mesh=mesh)
    t7 = time.perf_counter()
    print(f"engine warm e2e (semantic_segmentation): {t7 - t6:.2f}s "
          f"({len(pc) / (t7 - t6):,.0f} pts/s)")


if __name__ == "__main__":
    main()
