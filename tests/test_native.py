"""Native grid-kNN tests against the scipy KD-tree oracle."""

import numpy as np
import pytest

from scipy.spatial import cKDTree

native = pytest.importorskip("pointstowood_tpu.native")


def _check(src, qry, k):
    idx, d2 = native.grid_knn(src, qry, k, return_dist=True)
    ref_d, ref_i = cKDTree(src).query(qry, k=k)
    if k == 1:
        ref_d, ref_i = ref_d[:, None], ref_i[:, None]
    # distance multiset must match exactly (indices can differ on ties)
    np.testing.assert_allclose(
        np.sort(d2, axis=1), np.sort(ref_d**2, axis=1), rtol=1e-10, atol=1e-12
    )
    # and the indices must actually produce those distances
    gathered = ((qry[:, None, :] - src[idx]) ** 2).sum(-1)
    np.testing.assert_allclose(np.sort(gathered, 1), np.sort(d2, 1), rtol=1e-10)


def test_grid_knn_uniform(rng):
    src = rng.uniform(0, 10, size=(5000, 3))
    qry = rng.uniform(0, 10, size=(500, 3))
    _check(src, qry, 8)


def test_grid_knn_clustered(rng):
    # clumped density (trees): many points in small blobs + sparse background
    blobs = [rng.normal(c, 0.05, size=(800, 3)) for c in rng.uniform(0, 20, (6, 3))]
    src = np.concatenate(blobs + [rng.uniform(0, 20, size=(200, 3))])
    qry = rng.uniform(0, 20, size=(300, 3))
    _check(src, qry, 16)


def test_grid_knn_queries_outside_box(rng):
    src = rng.uniform(0, 1, size=(1000, 3))
    qry = rng.uniform(-3, 4, size=(200, 3))
    _check(src, qry, 4)


def test_grid_knn_k_exceeds_m(rng):
    src = rng.uniform(0, 1, size=(5, 3))
    idx = native.grid_knn(src, src, 8)
    assert idx.shape == (5, 5)  # clamped to m


def test_grid_knn_self_query(rng):
    src = rng.uniform(0, 5, size=(2000, 3))
    idx, d2 = native.grid_knn(src, src, 1, return_dist=True)
    np.testing.assert_array_equal(idx[:, 0], np.arange(2000))
    np.testing.assert_allclose(d2[:, 0], 0.0, atol=1e-20)


def test_grid_knn_degenerate_flat(rng):
    # all points in a plane (zero-volume bbox must not break the heuristic)
    src = rng.uniform(0, 10, size=(1000, 3))
    src[:, 2] = 5.0
    qry = rng.uniform(0, 10, size=(100, 3))
    _check(src, qry, 4)
