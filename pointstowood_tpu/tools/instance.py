"""Post-segmentation tree instance extraction.

Rebuilds the archived instance pipeline
(reference: pointstowood/archive/instance_all.py, 507 LoC): slice the
wood-classified points into height bands, cluster each band
(the reference uses fast_hdbscan, instance_all.py:264-275; here sklearn
DBSCAN — neither dependency-equivalent package is available), seed stems
from clusters in the DBH band, connect cluster centroids into a proximity
graph, run multi-source Dijkstra from the stem seeds
(instance_all.py:48-85,321-324), assign every wood cluster to its nearest
seed, and attach leaf points to the tree of their nearest wood point
(instance_all.py:379-477). Optionally writes one PLY per tree.

Run: python -m pointstowood_tpu.tools.instance segmented.ply --eps 0.3
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd


def instance_segment(
    pc: pd.DataFrame,
    slice_height: float = 0.5,
    eps: float = 0.3,
    min_samples: int = 10,
    dbh_band: tuple = (1.0, 1.6),
    link_dist: float = 1.0,
    leaf_attach_dist: float = 2.0,
) -> np.ndarray:
    """Per-point tree instance ids (-1 = unassigned).

    Requires ``label`` (1 = wood) and a height column (``n_z`` preferred,
    else z - min z).
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import dijkstra
    from sklearn.cluster import DBSCAN

    from pointstowood_tpu.predict.fusion import knn_indices

    n = len(pc)
    instance = np.full(n, -1, np.int64)
    xyz = pc[["x", "y", "z"]].to_numpy()
    height = (
        pc["n_z"].to_numpy() if "n_z" in pc.columns else xyz[:, 2] - xyz[:, 2].min()
    )
    wood_mask = pc["label"].to_numpy() > 0
    if wood_mask.sum() < min_samples:
        return instance
    wood_idx = np.flatnonzero(wood_mask)
    wood_xyz = xyz[wood_mask]
    wood_h = height[wood_mask]

    # ---- per-height-band clustering (instance_all.py:264-275)
    bands = np.floor(wood_h / slice_height).astype(np.int64)
    point_cluster = np.full(len(wood_idx), -1, np.int64)
    centroids, cluster_band = [], []
    next_cluster = 0
    for b in np.unique(bands):
        sel = np.flatnonzero(bands == b)
        if len(sel) < min_samples:
            continue
        labels = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(wood_xyz[sel])
        for lab in np.unique(labels):
            if lab < 0:
                continue
            members = sel[labels == lab]
            point_cluster[members] = next_cluster
            centroids.append(wood_xyz[members].mean(axis=0))
            cluster_band.append(b)
            next_cluster += 1
    if next_cluster == 0:
        return instance
    centroids = np.asarray(centroids)
    cluster_band = np.asarray(cluster_band)
    cluster_h = centroids[:, 2] - (xyz[:, 2].min() if "n_z" not in pc.columns else 0)
    if "n_z" in pc.columns:
        # approximate centroid height from member heights instead
        cluster_h = np.array([
            wood_h[point_cluster == c].mean() for c in range(next_cluster)
        ])

    # ---- stem seeds: clusters whose height band covers the DBH range
    seeds = np.flatnonzero((cluster_h >= dbh_band[0]) & (cluster_h <= dbh_band[1]))
    if len(seeds) == 0:  # fall back to the lowest clusters
        lowest = cluster_h <= np.percentile(cluster_h, 10)
        seeds = np.flatnonzero(lowest)
    # merge seeds within link_dist in xy into one tree each
    tree_of_seed = np.full(len(seeds), -1, np.int64)
    tree_count = 0
    for i, s in enumerate(seeds):
        if tree_of_seed[i] >= 0:
            continue
        tree_of_seed[i] = tree_count
        for j in range(i + 1, len(seeds)):
            if tree_of_seed[j] < 0 and np.linalg.norm(
                centroids[s, :2] - centroids[seeds[j], :2]
            ) < link_dist:
                tree_of_seed[j] = tree_count
        tree_count += 1

    # ---- proximity graph over centroids + multi-source Dijkstra
    k = min(8, next_cluster)
    nbr = knn_indices(centroids, centroids, k)
    rows = np.repeat(np.arange(next_cluster), k)
    cols = nbr.ravel()
    d = np.linalg.norm(centroids[rows] - centroids[cols], axis=1)
    keep = d <= link_dist * 2
    graph = coo_matrix(
        (d[keep], (rows[keep], cols[keep])), shape=(next_cluster, next_cluster)
    )
    dist_from_seeds = dijkstra(graph, directed=False, indices=seeds)
    best = np.argmin(dist_from_seeds, axis=0)  # nearest seed per cluster
    reachable = np.isfinite(dist_from_seeds[best, np.arange(next_cluster)])
    cluster_tree = np.where(reachable, tree_of_seed[best], -1)

    clustered = point_cluster >= 0
    wood_instance = np.full(len(wood_idx), -1, np.int64)
    wood_instance[clustered] = cluster_tree[point_cluster[clustered]]

    # noise wood points -> tree of the nearest assigned wood point
    assigned = np.flatnonzero(wood_instance >= 0)
    if len(assigned) and (wood_instance < 0).any():
        lost = np.flatnonzero(wood_instance < 0)
        nn = knn_indices(wood_xyz[assigned], wood_xyz[lost], 1)[:, 0]
        wood_instance[lost] = wood_instance[assigned[nn]]
    instance[wood_idx] = wood_instance

    # ---- leaf attachment (instance_all.py:379-477): nearest wood point
    leaf_idx = np.flatnonzero(~wood_mask)
    if len(leaf_idx) and len(wood_idx):
        nn = knn_indices(wood_xyz, xyz[leaf_idx], 1)[:, 0]
        dists = np.linalg.norm(xyz[leaf_idx] - wood_xyz[nn], axis=1)
        attach = dists <= leaf_attach_dist
        instance[leaf_idx[attach]] = instance[wood_idx[nn[attach]]]
    return instance


def main(argv=None):
    from pointstowood_tpu.io import load_file, save_file

    p = argparse.ArgumentParser()
    p.add_argument("point_cloud", help="segmented cloud with a label column")
    p.add_argument("--slice_height", type=float, default=0.5)
    p.add_argument("--eps", type=float, default=0.3)
    p.add_argument("--min_samples", type=int, default=10)
    p.add_argument("--link_dist", type=float, default=1.0)
    p.add_argument("--leaf_attach_dist", type=float, default=2.0)
    p.add_argument("--per-tree", action="store_true",
                   help="also write one PLY per extracted tree")
    args = p.parse_args(argv)

    pc = load_file(args.point_cloud)
    instance = instance_segment(
        pc, slice_height=args.slice_height, eps=args.eps,
        min_samples=args.min_samples, link_dist=args.link_dist,
        leaf_attach_dist=args.leaf_attach_dist,
    )
    pc["instance"] = instance.astype(float)
    out = args.point_cloud.replace(".ply", "_instance.ply")
    extras = [c for c in pc.columns if c not in ("x", "y", "z")]
    save_file(out, pc, additional_fields=extras)
    n_trees = int(instance.max()) + 1
    print(f"{n_trees} trees -> {out}")
    if getattr(args, "per_tree"):
        base = os.path.splitext(out)[0]
        for t in range(n_trees):
            tree_pc = pc[pc["instance"] == t]
            save_file(f"{base}_T{t}.ply", tree_pc, additional_fields=extras)
        print(f"wrote {n_trees} per-tree files")


if __name__ == "__main__":
    main()
