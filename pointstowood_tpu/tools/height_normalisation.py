"""DTM-based height normalization from ground-classified points.

Rebuilds the archived NormaliseHeight
(reference: pointstowood/archive/height_normalisation.py:18-43): build a
0.5 m digital terrain model from the median z of ground-labeled points
(label == 2) per cell, in-fill empty DTM cells with a growing-window
median, and normalize every point's height against it. Superseded in the
live path by the coarse per-cell minimum (gpu_ground /
ops.normalization.ground_normalize_np) but kept for capability parity.

Run: python -m pointstowood_tpu.tools.height_normalisation cloud.ply
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd


def normalise_height(pc: pd.DataFrame, cell: float = 0.5,
                     ground_label: float = 2.0) -> pd.DataFrame:
    """Add an ``n_z`` column: z minus the interpolated ground model."""
    from scipy import ndimage

    xi = np.floor(pc["x"].to_numpy() / cell).astype(np.int64)
    yi = np.floor(pc["y"].to_numpy() / cell).astype(np.int64)
    x0, y0 = xi.min(), yi.min()
    xi -= x0
    yi -= y0
    nx, ny = xi.max() + 1, yi.max() + 1

    dtm = np.full((nx, ny), np.nan)
    is_ground = pc["label"].to_numpy() == ground_label
    if is_ground.any():
        gz = pc["z"].to_numpy()[is_ground]
        gcell = xi[is_ground] * ny + yi[is_ground]
        order = np.argsort(gcell, kind="stable")
        gcell, gz = gcell[order], gz[order]
        bounds = np.flatnonzero(np.diff(gcell)) + 1
        cells = gcell[np.concatenate([[0], bounds])] if len(gcell) else []
        for c, zs in zip(cells, np.split(gz, bounds)):
            dtm[c // ny, c % ny] = np.median(zs)

    # growing-window median in-fill (height_normalisation.py:36-40)
    size = 3
    filled = dtm.copy()
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        while np.any(np.isnan(filled)) and size <= 2 * max(nx, ny) + 1:
            filled = ndimage.generic_filter(dtm, np.nanmedian, size=size)
            size += 2
    if np.any(np.isnan(filled)):  # no ground points at all
        filled = np.where(np.isnan(filled), np.nanmin(pc["z"]), filled)

    pc = pc.copy()
    pc["n_z"] = pc["z"].to_numpy() - filled[xi, yi]
    return pc


def main(argv=None):
    from pointstowood_tpu.io import load_file, save_file

    p = argparse.ArgumentParser()
    p.add_argument("point_cloud")
    p.add_argument("--cell", type=float, default=0.5)
    p.add_argument("--ground-label", type=float, default=2.0)
    args = p.parse_args(argv)
    pc = load_file(args.point_cloud)
    pc = normalise_height(pc, cell=args.cell, ground_label=args.ground_label)
    out = args.point_cloud.replace(".ply", "_nz.ply")
    save_file(out, pc,
              additional_fields=[c for c in pc.columns if c not in ("x", "y", "z")])
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
