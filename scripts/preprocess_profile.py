#!/usr/bin/env python3
"""Profile host-side preprocessing on a plot-scale synthetic cloud.
Feeds the streaming-input-pipeline work (VERDICT round-1 missing #4)."""

import cProfile
import os
import pstats
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointstowood_tpu.config import TilingConfig
from pointstowood_tpu.data.tiling import preprocess_cloud
from pointstowood_tpu.io.loader import canonicalize_columns

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000


def make_plot(n):
    rng = np.random.default_rng(0)
    # clustered forest-like density: trees + scattered ground
    centers = rng.uniform(0, 60, (40, 2))
    t = rng.integers(0, 40, n)
    xy = centers[t] + rng.normal(0, 1.5, (n, 2))
    z = np.abs(rng.normal(0, 6, n))
    return pd.DataFrame({
        "x": xy[:, 0], "y": xy[:, 1], "z": z,
        "reflectance": rng.normal(size=n),
    })


def main():
    df = make_plot(N)
    df, _, _ = canonicalize_columns(df, mode="predict")
    cfg = TilingConfig(grid_size=(2.0, 4.0), min_pts=128, max_pts=16384)
    t0 = time.perf_counter()
    prof = cProfile.Profile()
    prof.enable()
    tiles = preprocess_cloud(df, cfg)
    prof.disable()
    dt = time.perf_counter() - t0
    print(f"{N} pts -> {len(tiles)} tiles in {dt:.1f} s "
          f"({N / dt:,.0f} pts/s)")
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(18)


if __name__ == "__main__":
    main()
