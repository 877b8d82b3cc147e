"""Euclidean clustering (connected components under a distance tolerance).

Reimplements the reference EuclideanCluster
(reference: pointstowood/src/euclidean_clustering.py:7-47 and the
multiprocessing variant utils/euclidean_clustering_optim.py): BFS region
growing over fixed-radius neighborhoods, keeping clusters whose size falls
in [min_size, max_size]. This version replaces the per-point
query_ball_point loop with a single-pass connected-components computation
over the radius graph (scipy sparse), which is both exact and dramatically
faster; the native grid kNN provides the candidate pairs at plot scale.

Run: python -m pointstowood_tpu.tools.clustering cloud.ply --tolerance 0.05
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd


def euclidean_cluster(
    xyz: np.ndarray,
    tolerance: float,
    min_size: int = 1,
    max_size: int | None = None,
) -> np.ndarray:
    """Cluster ids per point (-1 for points in out-of-range clusters).

    Equivalent to BFS region growing with ``tolerance``: two points are in
    the same cluster iff connected by a chain of hops each <= tolerance.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    from scipy.spatial import cKDTree

    n = xyz.shape[0]
    tree = cKDTree(xyz)
    pairs = tree.query_pairs(tolerance, output_type="ndarray")
    graph = coo_matrix(
        (np.ones(len(pairs), np.int8), (pairs[:, 0], pairs[:, 1])), shape=(n, n)
    )
    _, labels = connected_components(graph, directed=False)
    # filter by cluster size, relabel compactly in first-appearance order
    sizes = np.bincount(labels)
    ok = sizes >= min_size
    if max_size is not None:
        ok &= sizes <= max_size
    out = np.full(n, -1, np.int64)
    next_id = 0
    remap: dict = {}
    for i, lab in enumerate(labels):
        if not ok[lab]:
            continue
        if lab not in remap:
            remap[lab] = next_id
            next_id += 1
        out[i] = remap[lab]
    return out


def main(argv=None):
    from pointstowood_tpu.io import load_file, save_file

    p = argparse.ArgumentParser()
    p.add_argument("point_cloud")
    p.add_argument("--tolerance", type=float, default=0.05)
    p.add_argument("--min_size", type=int, default=1)
    p.add_argument("--max_size", type=int, default=None)
    p.add_argument("--odir", type=str, default=None, help="output file path")
    args = p.parse_args(argv)

    pc = load_file(args.point_cloud)
    labels = euclidean_cluster(
        pc[["x", "y", "z"]].to_numpy(), args.tolerance, args.min_size, args.max_size
    )
    pc["cluster"] = labels.astype(float)
    out = args.odir or args.point_cloud.replace(".ply", "_clustered.ply")
    save_file(out, pc, additional_fields=[c for c in pc.columns if c not in ("x", "y", "z")])
    print(f"{labels.max() + 1} clusters -> {out}")


if __name__ == "__main__":
    main()
