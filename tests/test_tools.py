"""Analysis-tooling tests."""

import os

import numpy as np
import pandas as pd

from pointstowood_tpu.tools.clustering import euclidean_cluster
from pointstowood_tpu.tools.pathlength import pathlengths
from pointstowood_tpu.tools.compare import compare_directory
from pointstowood_tpu.tools.collect_attribute import collect_attributes
from pointstowood_tpu.tools.split_ply import split_and_save_ply
from pointstowood_tpu.io import read_ply, write_ply


def test_euclidean_cluster_two_blobs(rng):
    a = rng.normal(0, 0.01, size=(50, 3))
    b = rng.normal(0, 0.01, size=(60, 3)) + 10.0
    labels = euclidean_cluster(np.concatenate([a, b]), tolerance=0.5)
    assert len(set(labels[:50])) == 1 and len(set(labels[50:])) == 1
    assert labels[0] != labels[60]


def test_euclidean_cluster_size_filter(rng):
    a = rng.normal(0, 0.01, size=(50, 3))
    b = rng.normal(0, 0.01, size=(3, 3)) + 10.0
    labels = euclidean_cluster(np.concatenate([a, b]), tolerance=0.5, min_size=10)
    assert (labels[50:] == -1).all()
    assert (labels[:50] == labels[0]).all() and labels[0] >= 0


def test_pathlength_line():
    # evenly spaced points along a line (kNN graph fully connected):
    # pathlength == distance from the lowest point
    z = np.linspace(0, 10, 100)
    xyz = np.stack([np.zeros(100), np.zeros(100), z], axis=1)
    d = pathlengths(xyz, knn=3)
    np.testing.assert_allclose(d, z, rtol=1e-6, atol=1e-9)


def test_pathlength_disconnected_fill(rng):
    # a far-away blob is unreachable; it gets the max finite path length
    line = np.stack([np.zeros(50), np.zeros(50), np.linspace(0, 5, 50)], axis=1)
    blob = rng.normal(0, 0.01, size=(10, 3)) + [50, 0, 10]
    d = pathlengths(np.concatenate([line, blob]), knn=3)
    assert np.isfinite(d).all()
    np.testing.assert_allclose(d[50:], d[:50].max(), rtol=1e-6)


def test_pathlength_grown_graph_line():
    # grown graph on a line reproduces arc length from the root exactly
    z = np.linspace(0, 10, 100)
    xyz = np.stack([np.zeros(100), np.zeros(100), z], axis=1)
    d = pathlengths(xyz, knn=10, method="grown")
    np.testing.assert_allclose(d, z, rtol=1e-6, atol=1e-9)


def test_pathlength_grown_graph_bridges_gaps(rng):
    """The reference growth loop's reconnect phase (shortest_path.py:
    114-176) attaches points beyond the initial threshold by stepping it
    up — a gap the plain kNN graph at the same knn leaves disconnected
    still gets a real (finite, larger than the near side) distance."""
    line = np.stack([np.zeros(40), np.zeros(40), np.linspace(0, 2, 40)], axis=1)
    # second segment after a 1 m gap (>> nbrs_threshold 0.15)
    far = np.stack([np.zeros(20), np.zeros(20), np.linspace(3, 4, 20)], axis=1)
    xyz = np.concatenate([line, far])
    d = pathlengths(xyz, knn=60, method="grown", nbrs_threshold=0.15,
                    nbrs_threshold_step=0.05)
    assert np.isfinite(d).all()
    # far segment distances include the bridged gap
    assert d[40:].min() > d[:40].max()
    np.testing.assert_allclose(d[40:], xyz[40:, 2], rtol=0.05)


def test_pathlength_grown_matches_knn_on_dense_cloud(rng):
    """On a dense connected cloud both graph constructions give similar
    distances (the grown graph is a sparse subgraph; paths can be slightly
    longer but not shorter)."""
    xyz = np.cumsum(rng.normal(0, 0.05, size=(200, 3)), axis=0)
    d_knn = pathlengths(xyz, knn=20)
    d_grown = pathlengths(xyz, knn=20, method="grown")
    assert (d_grown >= d_knn - 1e-9).all()
    assert np.median(d_grown / np.maximum(d_knn, 1e-9)) < 1.5


def test_pathlength_downsampled_flow():
    from pointstowood_tpu.tools.pathlength import pathlengths_downsampled

    z = np.linspace(0, 10, 400)
    xyz = np.stack([np.zeros(400), np.zeros(400), z], axis=1)
    d = pathlengths_downsampled(xyz, voxel=0.5, knn=5)
    # every point inherits its 0.5 m cell representative's distance
    assert np.isfinite(d).all()
    np.testing.assert_allclose(d, z, atol=0.6)


def test_collect_attributes(rng):
    src = pd.DataFrame(rng.uniform(0, 1, (100, 3)), columns=["x", "y", "z"])
    src["label"] = np.arange(100).astype(float)
    tgt = src[["x", "y", "z"]].copy() + 1e-6
    out = collect_attributes(tgt, src, ["label"])
    np.testing.assert_array_equal(out["label"].to_numpy(), np.arange(100))
    # distance cutoff blanks far transfers
    far = src[["x", "y", "z"]].copy() + 100.0
    out2 = collect_attributes(far, src, ["label"], max_distance=0.5)
    assert (out2["label"].to_numpy() == 0).all()


def test_split_ply(tmp_path, rng):
    df = pd.DataFrame(rng.uniform(0, 10, (500, 3)), columns=["x", "y", "z"])
    p = str(tmp_path / "c.ply")
    write_ply(p, df)
    p1, p2 = split_and_save_ply(p)
    a, b = read_ply(p1), read_ply(p2)
    assert len(a) + len(b) == 500
    assert abs(len(a) - 400) <= 5  # ~80th percentile
    assert a["x"].max() <= b["x"].min()


def test_compare_directory(tmp_path, rng):
    n = 400
    truth = rng.integers(0, 2, n).astype(float)
    base = pd.DataFrame(rng.uniform(0, 5, (n, 3)), columns=["x", "y", "z"])
    ours = base.copy()
    ours["truth"] = truth
    ours["label"] = truth  # perfect predictions
    fsct = base.copy()
    fsct["truth"] = truth
    fsct["label"] = np.where(truth > 0, 2.0, 0.0)  # FSCT's label==2 wood code
    write_ply(str(tmp_path / "pol_plot_ours.ply"), ours)
    write_ply(str(tmp_path / "pol_plot_fsct.ply"), fsct)
    df = compare_directory(str(tmp_path))
    assert set(df["model"]) == {"ours", "fsct"}
    assert (df["balanced_accuracy"] == 1.0).all()
    assert (df["country"] == "Poland").all()


def test_threshold_sweep_monotone_wood_fraction(rng):
    from pointstowood_tpu.tools.threshold_sweep import sweep

    m = 400
    classified = np.concatenate(
        [rng.uniform(0, 5, size=(m, 3)),
         np.zeros((m, 1)),
         rng.uniform(0, 1, size=(m, 1))], axis=1,
    )
    pc = pd.DataFrame(rng.uniform(0, 5, (200, 3)), columns=["x", "y", "z"])
    fracs = []
    for t, labels in sweep(classified, pc, [0.2, 0.5, 0.8]):
        assert labels.shape == (200, 2)
        fracs.append(labels[:, 0].mean())
    # raising the threshold can only shrink the wood fraction
    assert fracs[0] >= fracs[1] >= fracs[2]
    assert fracs[0] > 0.5 and fracs[2] < 0.5
