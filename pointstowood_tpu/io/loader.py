"""Format-dispatching point-cloud load/save plus column canonicalization.

``load_file``/``save_file`` mirror the reference entry points
(reference: pointstowood/src/io.py:149-225); ``canonicalize_columns``
implements the column normalization both reference CLIs perform before
preprocessing (reference: pointstowood/predict.py:36-52, train.py:36-49).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd

from pointstowood_tpu.io.ply import read_ply, write_ply
from pointstowood_tpu.io.pcd import read_pcd, write_pcd

_PREDICTION_COLUMNS = ("label", "pwood", "pleaf")


def load_file(filename: str, additional_headers: bool = False, verbose: bool = False):
    """Load a .ply/.pcd/.las/.laz cloud into a DataFrame.

    With ``additional_headers=True`` also returns the non-xyz column names
    (reference io.py:175-177).
    """
    ext = os.path.splitext(filename)[1].lower()
    if ext in (".las", ".laz"):
        from pointstowood_tpu.io.las import read_las

        pc = read_las(filename)
    elif ext == ".ply":
        pc = read_ply(filename)
    elif ext == ".pcd":
        pc = read_pcd(filename)
    else:
        raise ValueError(f"point cloud format not recognised: {filename}")
    if verbose:
        print(f"read in {filename} with {len(pc)} points")
    if additional_headers:
        return pc, [c for c in pc.columns if c not in ("x", "y", "z")]
    return pc


def save_file(filename: str, pointcloud, additional_fields: Sequence[str] = (),
              verbose: bool = False) -> None:
    """Save a DataFrame or array to .ply/.las/.csv (reference io.py:180-225)."""
    if verbose:
        print("Saving file:", filename)
    cols = ["x", "y", "z"] + [c for c in additional_fields if c not in ("x", "y", "z")]
    if filename.endswith(".las"):
        from pointstowood_tpu.io.las import write_las

        arr = pointcloud.to_numpy() if isinstance(pointcloud, pd.DataFrame) else pointcloud
        write_las(filename, arr, additional_fields=list(additional_fields))
    elif filename.endswith(".csv"):
        pd.DataFrame(pointcloud).to_csv(filename, header=None, index=None, sep=" ")
    elif filename.endswith(".ply"):
        if not isinstance(pointcloud, pd.DataFrame):
            pointcloud = pd.DataFrame(pointcloud, columns=cols)
        write_ply(filename, pointcloud[[c for c in cols if c in pointcloud.columns]])
    else:
        raise ValueError(f"unsupported output format: {filename}")
    if verbose:
        print("Saved to:", filename)


def canonicalize_columns(
    df: pd.DataFrame, mode: str = "predict"
) -> Tuple[pd.DataFrame, List[str], bool]:
    """Normalize column names and ensure a reflectance column at position 3.

    Steps (matching reference predict.py:36-52 / train.py:36-49):
      * lower-case all column names,
      * in predict mode drop stale prediction columns (label/pwood/pleaf),
      * strip a ``scalar_`` prefix,
      * rename refl/intensity -> reflectance (and truth -> label when
        training),
      * inject an all-zeros reflectance column if absent,
      * move reflectance to column index 3 (right after x, y, z).

    Returns (df, extra_headers, had_reflectance) where ``had_reflectance``
    reports whether a real (pre-existing) reflectance column was found.
    """
    df = df.copy()
    df.columns = df.columns.str.lower()
    if mode == "predict":
        df = df.drop(columns=[c for c in _PREDICTION_COLUMNS if c in df.columns])
    df = df.rename(columns=lambda c: c.replace("scalar_", "") if "scalar_" in c else c)
    renames = {"refl": "reflectance", "intensity": "reflectance"}
    if mode != "predict":
        renames["truth"] = "label"
    df = df.rename(columns=renames)
    # Duplicate column names can result from renaming (e.g. both refl and
    # intensity present); keep the first.
    df = df.loc[:, ~df.columns.duplicated()]
    # Extra headers are recorded before reflectance injection so an injected
    # all-zeros column is not echoed into outputs (reference predict.py:42-44).
    headers = [c for c in df.columns[3:] if c not in _PREDICTION_COLUMNS]
    had_reflectance = "reflectance" in df.columns
    if not had_reflectance:
        df["reflectance"] = np.zeros(len(df))
    cols = list(df.columns)
    cols.insert(3, cols.pop(cols.index("reflectance")))
    df = df[cols]
    return df, headers, had_reflectance
