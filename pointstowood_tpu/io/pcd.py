"""PCD point-cloud reading/writing (reference: pointstowood/src/io.py:90-142).

Reads binary (float32 fields) and ascii PCD; writes PCD v0.7 with binary
float32 data and the x/y/z[/intensity] field layout the reference emits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def read_pcd(fp) -> pd.DataFrame:
    fields = None
    n_points = None
    fmt = None
    offset = 0
    with open(fp, "rb") as f:
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{fp}: unexpected EOF in PCD header")
            offset += len(line)
            tokens = line.decode("ISO-8859-1").split()
            if not tokens:
                continue
            key = tokens[0].upper()
            if key == "FIELDS":
                fields = tokens[1:]
            elif key == "POINTS":
                n_points = int(tokens[1])
            elif key == "WIDTH" and n_points is None:
                n_points = int(tokens[1])
            elif key == "DATA":
                fmt = tokens[1]
                break
    if fields is None or fmt is None:
        raise ValueError(f"{fp}: malformed PCD header")
    if fmt == "binary":
        with open(fp, "rb") as f:
            f.seek(offset)
            arr = np.fromfile(f, dtype="<f4")
        arr = arr[: n_points * len(fields)].reshape(-1, len(fields))
        return pd.DataFrame(arr, columns=fields)
    if fmt == "ascii":
        with open(fp, "r", encoding="ISO-8859-1") as f:
            f.seek(offset)
            arr = np.loadtxt(f, dtype=np.float64, ndmin=2)
        return pd.DataFrame(arr[:n_points], columns=fields)
    raise ValueError(f"{fp}: unsupported PCD data format {fmt!r}")


def write_pcd(df: pd.DataFrame, path: str, binary: bool = True) -> None:
    df = df.rename(columns={"scalar_intensity": "intensity"})
    columns = ["x", "y", "z"]
    if "intensity" in df.columns:
        columns.append("intensity")
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {' '.join(columns)}\n"
        f"SIZE {' '.join(['4'] * len(columns))}\n"
        f"TYPE {' '.join(['F'] * len(columns))}\n"
        f"COUNT {' '.join(['1'] * len(columns))}\n"
        f"WIDTH {len(df)}\n"
        "HEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {len(df)}\n"
    )
    data = df[columns].to_numpy().astype("<f4")
    if binary:
        with open(path, "wb") as pcd:
            pcd.write((header + "DATA binary\n").encode("ascii"))
            data.tofile(pcd)
    else:
        with open(path, "w") as pcd:
            pcd.write(header + "DATA ascii\n")
            np.savetxt(pcd, data, fmt="%.8g")
