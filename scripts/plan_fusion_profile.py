#!/usr/bin/env python3
"""Profile plan_fusion (pure host work) on the bench's synthetic 1M-pt
plot. The warm e2e spends ~0.3-0.6 s here (run under GIL contention with
the model phase); this isolates where the host time goes so the plan can
be vectorized. No TPU use: everything below is numpy.
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_POINTS = int(os.environ.get("E2E_POINTS", 1_000_000))


def main():
    import bench
    import pandas as pd

    from pointstowood_tpu.config import TilingConfig
    from pointstowood_tpu.data.dataset import TileBatcher
    from pointstowood_tpu.data.tiling import preprocess_cloud
    from pointstowood_tpu.io.loader import canonicalize_columns
    from pointstowood_tpu.predict.tpu_fusion import (
        layout_from_batches, plan_fusion,
    )

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

    tiling_cfg = TilingConfig()
    t0 = time.perf_counter()
    tiles = preprocess_cloud(pc, tiling_cfg)
    print(f"preprocess: {time.perf_counter() - t0:.2f}s ({len(tiles)} tiles)")

    batcher = TileBatcher(tiles, batch_size=8, min_pts=tiling_cfg.min_pts,
                          max_pts=tiling_cfg.max_pts)
    order = batcher.tile_order()
    layout = layout_from_batches(tiles, batcher.batch_plan(), 8)
    query_xyz = pc[["x", "y", "z"]].to_numpy()

    for i in range(2):
        t0 = time.perf_counter()
        plan = plan_fusion(tiles, order, query_xyz, tiling_cfg.min_pts,
                           tiling_cfg.max_pts, layout=layout)
        print(f"plan_fusion pass {i}: {time.perf_counter() - t0:.3f}s "
              f"({len(plan.dispatches)} dispatches, n_near {plan.n_near})")

    pr = cProfile.Profile()
    pr.enable()
    plan_fusion(tiles, order, query_xyz, tiling_cfg.min_pts,
                tiling_cfg.max_pts, layout=layout)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
