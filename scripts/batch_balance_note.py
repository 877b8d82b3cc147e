#!/usr/bin/env python3
"""Measure the batch point-count behavior of TileBatcher vs the
reference's BalancedBatchSampler (pointstowood/src/predicter.py:23-63)
on a realistic tile-size distribution (VERDICT r3 missing item 4).

The reference pairs short and long tiles so TOTAL points per dynamic
batch stay consistent (an OOM guard for dynamic shapes), and silently
drops up to batch_size-1 tiles from each half. Dense-padded TPU batches
bound points per batch by construction (batch_size x bucket capacity),
so the property to examine here is padding overhead and tile coverage.

Host-only (numpy + the tiling code); safe to run without a TPU.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def reference_pairing(lengths, batch_size):
    """Replicates BalancedBatchSampler.__iter__ (predicter.py:40-59):
    sort by length, split halves, pair half-batches of short and long."""
    idx = np.argsort(lengths)
    n = len(idx)
    half = batch_size // 2
    short, long_ = idx[: n // 2], idx[n // 2:]
    batches = []
    for i in range(0, len(short) - half + 1, half):
        if i + half <= len(long_):
            batches.append(np.concatenate([short[i:i + half],
                                           long_[i:i + half]]))
    used = set(np.concatenate(batches).tolist()) if batches else set()
    return batches, len(lengths) - len(used)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from host_fusion_bench import forest_cloud

    import pandas as pd
    from pointstowood_tpu.config import TilingConfig
    from pointstowood_tpu.data.dataset import TileBatcher
    from pointstowood_tpu.data.tiling import preprocess_cloud
    from pointstowood_tpu.io.loader import canonicalize_columns

    rng = np.random.default_rng(3)
    n = int(os.environ.get("BBN_POINTS", 1_000_000))
    q = forest_cloud(rng, n, max(int(np.sqrt(n / 2500)), 4))
    df = pd.DataFrame({"x": q[:, 0], "y": q[:, 1], "z": q[:, 2],
                       "scalar_Refl": rng.normal(size=len(q))})
    pc, _, _ = canonicalize_columns(df, mode="predict")
    cfg = TilingConfig()  # canonical dual grid 2/4 m, 128..16384
    tiles = preprocess_cloud(pc, cfg)
    lengths = np.array([len(t) for t in tiles])
    bs = 8
    print(f"{len(tiles)} tiles, sizes min/med/max "
          f"{lengths.min()}/{int(np.median(lengths))}/{lengths.max()}")

    ref_batches, ref_dropped = reference_pairing(lengths, bs)
    ref_pts = np.array([lengths[b].sum() for b in ref_batches])
    print(f"reference pairing: {len(ref_batches)} batches, points/batch "
          f"min/med/max {ref_pts.min()}/{int(np.median(ref_pts))}/"
          f"{ref_pts.max()} (spread {ref_pts.max() / ref_pts.min():.2f}x), "
          f"{ref_dropped} tiles dropped")

    batcher = TileBatcher(tiles, batch_size=bs, min_pts=cfg.min_pts,
                          max_pts=cfg.max_pts)
    tot_pad = tot_real = 0
    n_batches = 0
    covered = set()
    caps = []
    for cap, batch, t_idx in batcher:
        real = int(np.asarray(batch.mask).sum())
        tot_real += real
        tot_pad += batch.mask.size
        caps.append(cap * bs)
        n_batches += 1
        covered.update(int(i) for i in t_idx)
    print(f"TileBatcher: {n_batches} batches, padded points/batch bounded "
          f"at batch x capacity (max {max(caps):,}), padding overhead "
          f"{(tot_pad - tot_real) / tot_pad * 100:.1f}%, "
          f"{len(tiles) - len(covered)} tiles dropped")


if __name__ == "__main__":
    main()
