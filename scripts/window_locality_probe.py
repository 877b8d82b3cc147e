#!/usr/bin/env python3
"""Feasibility: if tile points are Morton-sorted, what fraction of true
k=32 neighbors fall within an index window of the query's own position?
Decides the windowed kNN/gather design (CPU-only, no TPU needed).

Tests three orderings: current (2m-cell sort, original order within), fine
z-major cell sort (0.04 m), and Morton (interleaved-bit) order; at the SA1
stage (16384-pt tile) and the eval-sampled SA2 stage (voxel reps).

RESULT (2026-08-17, forest-like 16384-pt tile): NEGATIVE — windowed
neighbor processing is not viable at the recall bar. Containment of true
k=32 neighbors within a +-W/2 index window:

    original (tile order)    W=1024:0.28  W=2048:0.48  W=4096:0.73
    fine cell sort 0.04m     W=1024:0.54  W=2048:0.82  W=4096:0.96
    morton                   W=1024:0.83  W=2048:0.89  W=4096:0.94
    morton + voxel reps      W=1024:0.85  W=2048:0.89  W=4096:0.94

Even Morton order leaves ~11% of true neighbors outside a 2048-wide
window (forest tiles: vertical trunks + layered crowns defeat 1D
space-filling locality); stacked on the ~0.95 selection recall that lands
near 0.85 overall — far below the quality bar. This closes the "windowed
one-hot MXU gather" and "windowed kNN" designs; together with the Mosaic
facts (no vectorized gather lowering; per-row dynamic-slice DMA measured
slower than XLA's gather, scripts/pallas_gather_probe.py) it makes the
fused gather+message kernel a documented negative result: the gather is
irreducibly per-row-DMA bound and a Pallas kernel cannot beat XLA's own
lowering of it.
"""

import os
import sys

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tile(n=16384, seed=0):
    # forest-like 4m tile: trunk cylinders + crowns + scatter
    rng = np.random.default_rng(seed)
    pts = []
    for _ in range(3):
        cx, cy = rng.uniform(0.5, 3.5, 2)
        m = n // 6
        th = rng.uniform(0, 2 * np.pi, m)
        r = rng.uniform(0.03, 0.2, m)
        pts.append(np.stack([cx + r * np.cos(th), cy + r * np.sin(th),
                             rng.uniform(0, 3.0, m)], 1))
        c = n // 6
        pts.append(np.stack([cx + rng.normal(0, 0.7, c),
                             cy + rng.normal(0, 0.7, c),
                             2.2 + rng.normal(0, 0.5, c)], 1))
    xyz = np.concatenate(pts)[:n].astype(np.float32)
    return xyz


def morton_order(xyz, bits=10):
    q = ((xyz - xyz.min(0)) / (np.ptp(xyz, 0).max() + 1e-9) *
         ((1 << bits) - 1)).astype(np.uint64)

    def spread(v):
        v &= 0x3FF
        v = (v | (v << 16)) & 0x30000FF
        v = (v | (v << 8)) & 0x300F00F
        v = (v | (v << 4)) & 0x30C30C3
        v = (v | (v << 2)) & 0x9249249
        return v

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


def cell_order(xyz, res):
    cells = np.floor((xyz - xyz.min(0)) / res).astype(np.int64)
    ext = cells.max(0) + 1
    ids = (cells[:, 0] * ext[1] + cells[:, 1]) * ext[2] + cells[:, 2]
    return np.argsort(ids, kind="stable")


def containment(xyz, k=32, windows=(512, 1024, 2048, 4096)):
    n = len(xyz)
    tree = cKDTree(xyz)
    _, nbr = tree.query(xyz, k=k)
    pos = np.arange(n)[:, None]
    delta = np.abs(nbr - pos)
    return {w: float((delta <= w // 2).mean()) for w in windows}


def main():
    xyz = make_tile()
    n = len(xyz)
    orders = {
        "original (tile order)": np.arange(n),
        "fine cell sort 0.04m": cell_order(xyz, 0.04),
        "fine cell sort 0.16m": cell_order(xyz, 0.16),
        "morton": morton_order(xyz),
    }
    for name, o in orders.items():
        c = containment(xyz[o])
        line = " ".join(f"W={w}:{v:.3f}" for w, v in c.items())
        print(f"{name:24s} {line}")

    # eval-sampled stage: voxel representatives at 0.08 m of the
    # morton-sorted tile (subset keeps parent order)
    o = morton_order(xyz)
    x = xyz[o]
    cells = np.floor((x - x.min(0)) / 0.08).astype(np.int64)
    ext = cells.max(0) + 1
    ids = (cells[:, 0] * ext[1] + cells[:, 1]) * ext[2] + cells[:, 2]
    _, first = np.unique(ids, return_index=True)
    reps = x[np.sort(first)]
    c = containment(reps)
    line = " ".join(f"W={w}:{v:.3f}" for w, v in c.items())
    print(f"{'morton + voxel reps':24s} {line}  ({len(reps)} reps)")


if __name__ == "__main__":
    main()
