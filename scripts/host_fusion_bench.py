#!/usr/bin/env python3
"""Plot-scale host-fusion kNN benchmark: first-party C++ grid kNN vs the
scipy cKDTree fallback, at the reference's regime (~1M queries x ~2M
classified rows, the dual-grid duplication of a 1M-pt plot; reference:
pointstowood/src/predicter.py:136-137 runs pykdtree here).

Usage: python scripts/host_fusion_bench.py [n_queries] [k]
Defaults: 1,000,000 queries, 2,000,000 sources, k=32 and 64.

Pure host work (no JAX) so it can run while the TPU is busy/wedged.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def forest_cloud(rng, n, side):
    """Forest-like point distribution: clustered crowns + trunks over a
    side x side m plot (mimics the spatial density structure that a
    uniform-grid kNN must handle, unlike a uniform random cube)."""
    n_trees = max(side * side // 10, 1)
    per = int(n // n_trees)
    pts = []
    for _ in range(int(n_trees)):
        cx, cy = rng.uniform(0, side, 2)
        n_tr = per // 3
        trunk = np.stack([
            cx + rng.normal(0, 0.1, n_tr),
            cy + rng.normal(0, 0.1, n_tr),
            rng.uniform(0, 6, n_tr),
        ], 1)
        crown = np.stack([
            cx + rng.normal(0, 1.2, per - n_tr),
            cy + rng.normal(0, 1.2, per - n_tr),
            4 + rng.normal(0, 1.0, per - n_tr),
        ], 1)
        pts.append(trunk)
        pts.append(crown)
    out = np.concatenate(pts)[:n]
    return np.ascontiguousarray(out, np.float64)


def main():
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_s = 2 * n_q
    ks = [int(sys.argv[2])] if len(sys.argv) > 2 else [32, 64]
    rng = np.random.default_rng(11)
    side = max(int(np.sqrt(n_q / 2500)), 4)  # ~2.5k pts/m^2, TLS-like
    q = forest_cloud(rng, n_q, side)
    # sources = the queries duplicated at two scales with voxel jitter
    # (what the dual-grid classified rows look like)
    s = np.concatenate([
        q + rng.normal(0, 0.005, q.shape),
        q + rng.normal(0, 0.01, q.shape),
    ])[:n_s]
    s = np.ascontiguousarray(s)
    print(f"sources {n_s:,} x queries {n_q:,} over {side}x{side} m")

    results = {}
    for k in ks:
        try:
            from pointstowood_tpu.native import grid_knn

            t0 = time.perf_counter()
            idx_n = grid_knn(s, q, k)
            t_native = time.perf_counter() - t0
            print(f"native grid_knn   k={k}: {t_native:7.2f}s "
                  f"({n_q / t_native:,.0f} queries/s)")
            results[("native", k)] = t_native
        except Exception as e:
            print(f"native grid_knn   k={k}: unavailable ({e})")
            idx_n = None

        from scipy.spatial import cKDTree

        t0 = time.perf_counter()
        tree = cKDTree(s)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        d, idx_s = tree.query(q, k=k, workers=-1)
        t_query = time.perf_counter() - t0
        print(f"scipy cKDTree     k={k}: build {t_build:6.2f}s + query "
              f"{t_query:7.2f}s = {t_build + t_query:7.2f}s "
              f"({n_q / (t_build + t_query):,.0f} queries/s)")
        results[("scipy", k)] = t_build + t_query

        if idx_n is not None:
            # exactness spot check: same neighbor distance multiset on a
            # sample (indices may differ on ties)
            sample = rng.choice(n_q, 2000, replace=False)
            dn = np.sort(((s[idx_n[sample]] - q[sample][:, None]) ** 2)
                         .sum(-1), axis=1)
            ds = np.sort(((s[idx_s[sample]] - q[sample][:, None]) ** 2)
                         .sum(-1), axis=1)
            ok = np.allclose(dn, ds, rtol=1e-9, atol=1e-12)
            print(f"  exactness vs scipy on 2000 sampled rows: "
                  f"{'OK' if ok else 'MISMATCH'}")

    for (impl, k), t in sorted(results.items()):
        print(f"RESULT {impl} k={k}: {t:.2f}s")


if __name__ == "__main__":
    main()
