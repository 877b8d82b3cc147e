"""Native (C++/OpenMP) host-side components, bound via ctypes.

The reference delegates its plot-scale fusion kNN to pykdtree (C/OpenMP,
reference: pointstowood/src/predicter.py:6,136-137); here the equivalent is
a first-party uniform-grid exact kNN (grid_knn.cpp), compiled on first use
with the system toolchain and cached next to the source. scipy's cKDTree
remains the automatic fallback (pointstowood_tpu/predict/fusion.py) when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "grid_knn.cpp")
_LIB = os.path.join(_HERE, "libgridknn.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_LIB + ".tmp", _LIB)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.grid_knn_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.grid_knn_f64.restype = None
        _lib = lib
        return _lib


def grid_knn(
    source_xyz: np.ndarray,
    query_xyz: np.ndarray,
    k: int,
    cell: float = 0.0,
    return_dist: bool = False,
):
    """Exact kNN indices of each query point into source_xyz.

    Returns (n, k) int64 indices (and squared distances when
    ``return_dist``). ``cell=0`` picks a density heuristic.
    """
    lib = _load()
    src = np.ascontiguousarray(source_xyz[:, :3], dtype=np.float64)
    qry = np.ascontiguousarray(query_xyz[:, :3], dtype=np.float64)
    m, n = src.shape[0], qry.shape[0]
    k = int(min(k, m))
    idx = np.empty((n, k), dtype=np.int64)
    d2 = np.empty((n, k), dtype=np.float64) if return_dist else None
    lib.grid_knn_f64(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
        qry.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        k, float(cell),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if return_dist
        else ctypes.POINTER(ctypes.c_double)(),
    )
    if return_dist:
        return idx, d2
    return idx
