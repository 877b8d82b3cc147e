"""Fusion of per-tile predictions back onto the original cloud.

Replaces the reference's pykdtree + numba stack
(reference: pointstowood/src/predicter.py:107-142): every original point
queries its k nearest classified points (tiles overlap across grid scales,
so each point typically has ~2x duplicates — the implicit two-scale
ensemble), takes the median of their wood probabilities as ``pwood`` and a
probability-weighted vote as ``label`` (predicter.py:113-127).

Neighbor indices come from the native C++ grid kNN when available (see
pointstowood_tpu/native), else scipy's cKDTree; the median/vote math runs
vectorized in JAX, processing the (N, k) gather in fixed-size chunks.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd


@functools.partial(jax.jit, static_argnames=("any_wood_is_one",))
def _fuse_chunk(prob, idx, is_wood, any_wood, any_wood_is_one: bool):
    """Median prob + vote for one (n, k) index chunk.

    prob: (M,) classified wood probabilities; per-point predictions are
    recomputed here as prob >= is_wood (identical to the reference, which
    thresholds once at predicter.py:202 and votes on the result — deriving
    them in-kernel keeps the dominant row gather one column wide).
    idx: (n, k) neighbor indices into prob.
    """
    p = prob[idx]  # (n, k)
    c = (p >= is_wood).astype(p.dtype)
    pwood = jnp.median(p, axis=1)
    if any_wood_is_one:
        # probability-weighted vote between class 0 and 1; ties -> 0
        # (np.argmax semantics over the reference's zero-padded vote vector)
        vote1 = jnp.sum(jnp.where(c == 1, p, 0.0), axis=1)
        vote0 = jnp.sum(jnp.where(c == 0, p, 0.0), axis=1)
        label = (vote1 > vote0).astype(jnp.float32)
    else:
        # any neighbor predicted wood (pred > any_wood with pred in {0,1})
        label = jnp.any(c > any_wood, axis=1).astype(jnp.float32)
    return label, pwood


def _auto_chunk(k: int) -> int:
    """Queries per fusion chunk: the kernel's dominant temporaries are ~3
    (chunk, k) fp32 blocks; cap them near 512 MB of device scratch and keep
    powers of two so chunk-shape compiles are reused across runs."""
    n = max(1 << 16, (1 << 29) // (12 * k))
    return 1 << (n.bit_length() - 1)


def fuse_labels(
    classified: np.ndarray,
    query_xyz: np.ndarray,
    is_wood: float,
    any_wood: float,
    chunk: int | None = None,
    indices: np.ndarray | None = None,
) -> np.ndarray:
    """Return (N, 2) [label, pwood] for every query point.

    classified: (M, >=5) columns [..., pred, prob] (prob at -1, xyz at :3)
    as in the reference's vstacked tile outputs. Predictions are derived
    from prob >= is_wood inside the fusion kernel, so re-fusing at a new
    threshold needs no column rewriting (see tools/threshold_sweep.py).
    """
    k = 64 if any_wood == 1 else 32
    m = classified.shape[0]
    k = min(k, m)
    if chunk is None:
        chunk = _auto_chunk(k)
    if indices is None:
        indices = knn_indices(classified[:, :3], query_xyz, k)
    prob = jnp.asarray(classified[:, -1].astype(np.float32))
    out = np.zeros((query_xyz.shape[0], 2), np.float64)
    for start in range(0, query_xyz.shape[0], chunk):
        idx = jnp.asarray(indices[start : start + chunk].astype(np.int32))
        label, pwood = _fuse_chunk(
            prob, idx, jnp.float32(is_wood), any_wood, any_wood == 1
        )
        out[start : start + chunk, 0] = np.asarray(label)
        out[start : start + chunk, 1] = np.asarray(pwood)
    return out


def warm_fuse(m: int, n_queries: int, k: int, is_wood: float,
              any_wood: float, chunk: int | None = None) -> None:
    """Pre-compile _fuse_chunk for the exact shapes fuse_labels will use.

    Every shape is known before the model produces a single probability
    (m = total valid tile points, n_queries = original cloud size), so the
    predict engine triggers this compile concurrently with the model phase
    — on relay-compiled environments it is tens of seconds off the
    post-model critical path.
    """
    if chunk is None:
        chunk = _auto_chunk(min(k, m))
    prob = jnp.zeros(m, jnp.float32)
    shapes = sorted({min(chunk, n_queries - s)
                     for s in range(0, n_queries, chunk)})
    for s in shapes:
        _fuse_chunk(prob, jnp.zeros((s, k), jnp.int32),
                    jnp.float32(is_wood), any_wood, any_wood == 1)


def knn_indices(source_xyz: np.ndarray, query_xyz: np.ndarray, k: int) -> np.ndarray:
    """Plot-scale exact kNN indices: scipy cKDTree when available, else
    the first-party C++ grid search.

    Measured on a clustered 1M x 2M vegetation cloud on this 1-core host
    (scripts/host_fusion_bench.py, 2026-08-19): cKDTree 10.8 s / 21.1 s at
    k=32 / 64 vs grid kNN 17.9 s / 32.4 s (identical exact results) — the
    k-d tree's adaptive splits beat a uniform grid on strongly non-uniform
    density, so it is the default and the grid covers scipy-less installs.
    Either way this host path is the fallback tier; plot-scale fusion
    normally runs on device (predict/tpu_fusion.py). At plot scale the
    host tier is SLOW and says so loudly: the reference regime is a
    10^7 x 10^7 global query (src/predicter.py:136-137), ~minutes of
    single-core host kNN here."""
    n_q = int(len(query_xyz))
    if n_q >= 1_000_000:
        import warnings

        est = n_q / 1e6 * (10.8 if k <= 32 else 21.1)
        warnings.warn(
            f"plot-scale fusion fell back to the HOST kNN tier "
            f"({n_q:,} queries x {len(source_xyz):,} sources, k={k}): "
            f"expect ~{est:.0f}s of single-core search (measured "
            f"scripts/host_fusion_bench.py). The device fusion path "
            f"(predict/tpu_fusion.py) declines only non-dual-grid / "
            f"cluster_features / min_pts<32 configs — prefer those "
            f"defaults at plot scale.",
            RuntimeWarning,
            stacklevel=2,
        )
    try:
        from scipy.spatial import cKDTree
    except Exception as e:  # pragma: no cover - scipy is a std dependency
        import sys

        print(
            f"note: scipy unavailable ({type(e).__name__}: {e}); host "
            "fusion kNN using the bundled C++ grid search (needs g++ on "
            "first use)",
            file=sys.stderr,
        )
        from pointstowood_tpu.native import grid_knn

        return grid_knn(source_xyz, query_xyz, k)
    tree = cKDTree(source_xyz)
    _, idx = tree.query(query_xyz, k=k, workers=-1)
    if k == 1:
        idx = idx[:, None]
    return idx


class Fusion:
    """Reference PointCloudClassifier equivalent (predicter.py:107-142)."""

    def __init__(self, is_wood: float, any_wood: float):
        self.is_wood = is_wood
        self.any_wood = any_wood

    def collect_predictions(self, classification: np.ndarray,
                            original: pd.DataFrame,
                            indices: np.ndarray | None = None,
                            fused: np.ndarray | None = None) -> pd.DataFrame:
        """``indices``: optional precomputed (N, k) neighbor indices of the
        original points into the classified rows — the predict engine
        builds them concurrently with the model phase (classified
        positions are known before the model runs). ``fused``: optional
        precomputed (N, 2) [label, pwood] (the on-device fusion path
        computes median/vote inside the neighbor-search dispatch)."""
        # shallow copy + column replacement (a drop() would deep-copy every
        # block of a ~1M-row frame just to re-add label/pwood — measurable
        # host time inside the warm path); replacing a column on the copy
        # installs a new block there and never writes the caller's frame
        original = original.copy(deep=False)
        if "pleaf" in original.columns:
            original = original.drop(columns=["pleaf"])
        if fused is None:
            # nbrs.npy cache next to the CWD, as the reference honors
            # (predicter.py:131-134)
            if indices is None and os.path.exists("nbrs.npy"):
                indices = np.load("nbrs.npy")
            fused = fuse_labels(
                classification,
                original[["x", "y", "z"]].to_numpy(),
                self.is_wood,
                self.any_wood,
                indices=indices,
            )
        original["label"] = fused[:, 0]
        original["pwood"] = fused[:, 1]
        return original
