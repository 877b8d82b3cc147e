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
    from pointstowood_tpu.data.tiling import preprocess_cloud
    from pointstowood_tpu.io.loader import canonicalize_columns
    from pointstowood_tpu.parallel.mesh import data_mesh
    from pointstowood_tpu.predict.predicter import semantic_segmentation

    _, variables, _, _ = bench.forward_benchmark()

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

    # warm engine pass with verbose phase breakdown (the engine's own
    # model/fusion timers reflect the zero-upload sink path — a
    # standalone run_inference/fuse_on_device call here would measure the
    # host-upload fallback instead and cold-compile its layout variants)
    walls = []
    for i in range(int(os.environ.get("E2E_WARM_PASSES", 3))):
        t6 = time.perf_counter()
        out = semantic_segmentation(pc, tiles, variables, model_cfg,
                                    predict_cfg, tiling_cfg, mesh=mesh,
                                    verbose=True)
        t7 = time.perf_counter()
        walls.append(t7 - t6)
        print(f"engine warm e2e pass {i}: {t7 - t6:.2f}s "
              f"({len(pc) / (t7 - t6):,.0f} pts/s, "
              f"wood frac {out['label'].mean():.3f})")
    best = min(walls)
    print(f"engine warm e2e best-of-{len(walls)}: {best:.2f}s "
          f"({len(pc) / best:,.0f} pts/s)")


if __name__ == "__main__":
    main()
