"""LAS/LAZ reading/writing via laspy (reference: pointstowood/src/io.py:154-210).

laspy is an optional dependency; these functions raise a clear error when it
is unavailable (it is not installed in this build environment).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _laspy():
    try:
        import laspy
    except ImportError as e:  # pragma: no cover - depends on environment
        raise ImportError(
            "LAS/LAZ support requires the 'laspy' package, which is not "
            "installed. Convert to PLY or PCD instead."
        ) from e
    return laspy


def read_las(filename: str) -> pd.DataFrame:
    laspy = _laspy()
    f = laspy.read(filename)
    return pd.DataFrame(
        np.vstack((f.x, f.y, f.z)).T, columns=["x", "y", "z"]
    )


def write_las(filename: str, pointcloud: np.ndarray, additional_fields=()) -> None:
    """Write xyz (+extra float64 dims) as LAS 1.4 point format 7."""
    laspy = _laspy()
    las = laspy.create(file_version="1.4", point_format=7)
    las.header.offsets = np.min(pointcloud[:, :3], axis=0)
    las.header.scales = [0.001, 0.001, 0.001]
    las.x = pointcloud[:, 0]
    las.y = pointcloud[:, 1]
    las.z = pointcloud[:, 2]
    extra = list(additional_fields)[3:] if len(additional_fields) else []
    for i, header in enumerate(extra):
        column = pointcloud[:, 3 + i]
        if header in ("red", "green", "blue"):
            setattr(las, header, column)
        else:
            las.add_extra_dim(laspy.ExtraBytesParams(name=header, type="f8"))
            setattr(las, header, column)
    las.write(filename)
