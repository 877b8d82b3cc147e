"""Host-side preprocessing: ground normalization, reflectance quantile
normalization, and multi-scale voxel tiling.

Reimplements the reference Voxelise pipeline
(reference: pointstowood/src/preprocessing.py:9-131) as vectorized numpy —
the reference's per-voxel Python loop over ``torch.unique`` cells
(preprocessing.py:59-63, one GPU sync per cell) becomes a single
argsort + split. Tiles are returned in memory as float32 arrays instead of
being spilled to per-tile ``voxel_N.pt`` files (the reference writes and
re-reads them in the same process; an optional on-disk cache is provided
for debugging parity).

Behavioral notes vs the reference:
  * Cells are clustered on x/y/z only. The reference passes its full
    feature tensor to voxel_grid (preprocessing.py:58), which additionally
    buckets by reflectance/n_z/extra columns — an artifact of reusing the
    tensor, documented here as a deliberate deviation (spatial tiling is
    the stated intent; fusion makes tile membership non-semantic).
  * Oversized cells are subsampled exactly as the reference does
    (preprocessing.py:116-120): reflectance-weighted sampling without
    replacement when reflectance is present, uniform WITH replacement
    (torch.randint semantics) otherwise.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import List, Sequence

import numpy as np
import pandas as pd

from pointstowood_tpu.config import TilingConfig
from pointstowood_tpu.ops.normalization import ground_normalize_np, quantile_normalize_np


@dataclasses.dataclass
class Tile:
    """One voxel tile: float32 points [x, y, z, reflectance, (label)]."""

    points: np.ndarray  # (n, 4) predict / (n, 5) train
    grid_size: float
    # packed cell id within its grid scale (-1 = unknown, e.g. tiles read
    # back from disk); lets the TPU fusion path map original points back
    # to the tile that classified them
    cell_id: int = -1
    # original-cloud row per tile row (None = unknown, e.g. legacy disk
    # caches); lets fusion read query coordinates straight from the
    # device-resident tile arrays instead of re-uploading them
    indices: np.ndarray | None = None

    def __len__(self):
        return self.points.shape[0]


NAN_CELL = np.int64(-(2 ** 62))  # sentinel id for non-finite rows


def cell_ids_for(feats: np.ndarray, size: float) -> np.ndarray:
    """Packed voxel cell id per point (deterministic in the cloud: origin
    and extents come from the cloud itself, so recomputing on the same
    cloud reproduces the ids tiles were built from).

    Non-finite rows get the NAN_CELL sentinel instead of poisoning the
    origin/extents for every other row (one NaN point used to silently
    degrade the whole plot's tile-coverage lookup)."""
    finite = np.isfinite(feats).all(axis=1)
    if finite.all():
        origin = feats.min(axis=0)
        clean = feats
    elif finite.any():
        origin = feats[finite].min(axis=0)
        clean = np.where(finite[:, None], feats, origin)
    else:
        return np.full(feats.shape[0], NAN_CELL)
    cells = np.floor((clean - origin) / size).astype(np.int64)
    extent = cells.max(axis=0) + 1
    ids = cells[:, 0]
    for d in range(1, cells.shape[1]):
        ids = ids * extent[d] + cells[:, d]
    return np.where(finite, ids, NAN_CELL)


def cell_ids_multi(feats: np.ndarray, sizes) -> np.ndarray:
    """``cell_ids_for`` for several grid sizes in one pass, returning an
    (n, len(sizes)) int64 array. The finite mask, origin, and cleaned
    coordinates are scale-independent and computed once; a scale whose
    ratio to the finest is an exact power of two derives its integer
    cells by right-shifting the finest scale's (scaling by a power of two
    commutes with fp rounding, so ``fl(rel/(s*2^k)) == fl(rel/s) * 2^-k``
    and the fold reproduces ``cell_ids_for`` bit-for-bit — pinned by
    tests). The canonical dual grid [2.0, 4.0] takes the folded path."""
    sizes = [float(s) for s in sizes]
    n = feats.shape[0]
    out = np.empty((n, len(sizes)), np.int64)
    finite = np.isfinite(feats).all(axis=1)
    if finite.all():
        origin = feats.min(axis=0)
        clean = feats
    elif finite.any():
        origin = feats[finite].min(axis=0)
        clean = np.where(finite[:, None], feats, origin)
    else:
        out[:] = NAN_CELL
        return out
    rel = clean - origin
    base = min(sizes)
    base_cells = None
    for si, s in enumerate(sizes):
        ratio = s / base
        k = int(ratio).bit_length() - 1 if ratio >= 1 else -1
        if base_cells is not None and k >= 0 and ratio == float(2 ** k):
            cells = base_cells >> k  # rel >= 0, so >> is the exact floor
        else:
            cells = np.floor(rel / s).astype(np.int64)
            if s == base:
                base_cells = cells
        extent = cells.max(axis=0) + 1
        ids = cells[:, 0]
        for d in range(1, cells.shape[1]):
            ids = ids * extent[d] + cells[:, d]
        out[:, si] = np.where(finite, ids, NAN_CELL)
    return out


def _split_by_cell(feats: np.ndarray, size: float):
    """(cell_id, point-index array) per occupied (size^D) voxel cell.

    ``feats`` is (N, D): 3 columns for spatial tiling, or the full feature
    tensor in reference-parity mode (torch_cluster's voxel_grid broadcasts a
    scalar size over every input dimension)."""
    ids = cell_ids_for(feats, size)
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    boundaries = np.flatnonzero(np.diff(sorted_ids)) + 1
    groups = np.split(order, boundaries)
    group_ids = sorted_ids[np.concatenate([[0], boundaries])]
    return list(zip(group_ids.tolist(), groups))


def preprocess_cloud(
    pc: pd.DataFrame,
    config: TilingConfig,
    with_labels: bool = False,
    seed: int = 141190,
    vxdir: str | None = None,
) -> List[Tile]:
    """Normalize and tile a canonicalized cloud (x, y, z, reflectance, ...).

    Mutates ``pc`` by adding the ``n_z`` height-normalized column (the
    reference writes it back into args.pc at preprocessing.py:131). Returns
    the tile list; if ``vxdir`` is given, also writes each tile as
    ``voxel_{i}.npy`` for inspection.
    """
    rng = np.random.default_rng(seed)
    if "n_z" not in pc.columns:
        pc["n_z"] = ground_normalize_np(
            pc[["x", "y", "z"]].to_numpy(), grid_resolution=config.ground_grid
        )

    xyz = pc[["x", "y", "z"]].to_numpy().astype(np.float32)
    refl = pc["reflectance"].to_numpy().astype(np.float32)
    reflectance_not_zero = not np.all(refl == 0)
    if reflectance_not_zero:
        refl = quantile_normalize_np(refl)

    columns = [xyz, refl[:, None]]
    if with_labels:
        columns.append(pc["label"].to_numpy().astype(np.float32)[:, None])
    data = np.concatenate(columns, axis=1)

    # Sampling weight for oversized cells (preprocessing.py:98-104).
    if reflectance_not_zero:
        weight = refl - refl.min()
        weight = np.where(np.isfinite(weight), weight, 0.0) + 1e-8
    else:
        weight = None

    # Spatial tiling clusters on xyz only (the stated intent). Parity mode
    # replicates the reference's accidental full-tensor clustering
    # (preprocessing.py:58): quantile-normalized reflectance, (label), and
    # the appended n_z column all contribute voxel boundaries.
    if getattr(config, "cluster_features", False):
        cluster_arr = np.concatenate(
            [data, pc["n_z"].to_numpy().astype(np.float32)[:, None]], axis=1
        )
    else:
        cluster_arr = xyz

    tiles: List[Tile] = []
    for size in config.grid_size:
        for cid, cell_idx in _split_by_cell(cluster_arr, float(size)):
            if cell_idx.shape[0] < config.min_pts:
                continue
            if cell_idx.shape[0] > config.max_pts:
                if weight is not None:
                    # Efraimidis-Spirakis keys: identical distribution to
                    # torch.multinomial's weighted draw without
                    # replacement (preprocessing.py:118), but vectorized —
                    # np.random.choice(replace=False, p=...) is sequential
                    # and costs seconds per oversized cell
                    w = weight[cell_idx]
                    keys = np.log(rng.random(cell_idx.shape[0])) / w
                    top = np.argpartition(keys, -config.max_pts)
                    cell_idx = cell_idx[top[-config.max_pts :]]
                else:
                    cell_idx = cell_idx[
                        rng.integers(0, cell_idx.shape[0], size=config.max_pts)
                    ]
            keep = ~np.isnan(data[cell_idx]).any(axis=1)
            cell_idx = cell_idx[keep]
            if cell_idx.shape[0] == 0:
                continue
            tiles.append(Tile(points=data[cell_idx], grid_size=float(size),
                              cell_id=int(cid),
                              indices=cell_idx.astype(np.int64)))

    if vxdir is not None:
        os.makedirs(vxdir, exist_ok=True)
        # Continue numbering after any tiles already in the directory so
        # multi-cloud datasets accumulate instead of overwriting each other
        # (the reference does the same via file_counter = len(glob(...)),
        # preprocessing.py:110).
        start = len(glob.glob(os.path.join(vxdir, "voxel_*.npy")))
        for i, t in enumerate(tiles):
            np.save(os.path.join(vxdir, f"voxel_{start + i}.npy"), t.points)
            # sidecar keeps grid_size/cell_id so cached-tile flows retain
            # the TPU fusion path and scale grouping (a bare points array
            # reloads with grid_size=0/cell_id=-1, silently disqualifying
            # both)
            np.save(
                os.path.join(vxdir, f"voxel_{start + i}.meta.npy"),
                np.array(
                    [(t.grid_size, t.cell_id)],
                    dtype=[("grid_size", "f8"), ("cell_id", "i8")],
                ),
            )
            if t.indices is not None:
                np.save(
                    os.path.join(vxdir, f"voxel_{start + i}.indices.npy"),
                    t.indices,
                )
    return tiles


def load_tiles(vxdir: str) -> List[Tile]:
    """Read tiles cached by ``preprocess_cloud(vxdir=...)``, restoring
    grid_size/cell_id from the ``.meta.npy`` sidecars when present (tiles
    cached by older versions load with the unknown-metadata defaults)."""
    tiles = []
    for f in sorted(
        glob.glob(os.path.join(vxdir, "voxel_*[0-9].npy")),
        key=lambda p: int(os.path.splitext(os.path.basename(p))[0].split("_")[1]),
    ):
        grid_size, cell_id = 0.0, -1
        meta = f[: -len(".npy")] + ".meta.npy"
        if os.path.exists(meta):
            m = np.load(meta)
            grid_size = float(m["grid_size"][0])
            cell_id = int(m["cell_id"][0])
        idx_file = f[: -len(".npy")] + ".indices.npy"
        indices = np.load(idx_file) if os.path.exists(idx_file) else None
        tiles.append(Tile(points=np.load(f), grid_size=grid_size,
                          cell_id=cell_id, indices=indices))
    return tiles
