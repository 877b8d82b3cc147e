"""Static-shape voxel-grid clustering.

TPU-native replacement for torch-cluster ``voxel_grid`` + PyG
``consecutive_cluster`` (reference: pointstowood/src/model.py:103-106,
src/preprocessing.py:55-64). Instead of dynamic unique-cluster lists, cells
are hashed to packed int32 ids and representatives are selected with a
sort-based segmentation, producing fixed-capacity index arrays + masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bits per packed coordinate axis. Tile extents are a few meters and SA
# resolutions are >= 0.04 m, so cell coordinates stay well under 2^10.
_AXIS_BITS = 10
_AXIS_SIZE = 1 << _AXIS_BITS
# Sentinel id for padded points: sorts after every real cell id. Kept as a
# Python int on purpose: module-level jnp arrays captured into traced
# functions trigger a pathological constant-embedding path (~40s per lower)
# under this environment's PJRT plugin.
PAD_CELL = (1 << 31) - 1


def check_voxel_pack_range(extent_m: float, resolution_m: float) -> None:
    """Guard for the packed int32 cell-id range (host-side, call before
    tracing): a tile spanning more than 2^10 cells per axis at the finest
    sampling resolution would silently alias inside voxel_cell_ids. Tile
    extent is bounded by the tiling grid size, so engines validate
    max(grid_size) against min(sa_resolutions) up front.
    """
    import math

    cells = math.ceil(float(extent_m) / float(resolution_m))
    if cells > _AXIS_SIZE:
        raise ValueError(
            f"voxel sampling grid overflow: a {extent_m} m tile at "
            f"{resolution_m} m resolution spans {cells} cells per axis, but "
            f"packed cell ids support at most {_AXIS_SIZE}. Use a smaller "
            f"--grid_size or a coarser SA resolution."
        )


def voxel_cell_ids(pos: jax.Array, size, mask: jax.Array | None = None) -> jax.Array:
    """Packed int32 voxel cell id per point.

    The grid origin is the per-sample minimum of the valid points (matching
    PyG voxel_grid's default start = per-batch min). Invalid points get
    PAD_CELL. Cell coordinates are clipped to the packable range; tiles
    larger than 2^10 cells per axis would alias (never the case for the
    <=6 m tiles this pipeline produces at >=0.04 m resolutions).
    """
    pos = pos.astype(jnp.float32)
    if mask is None:
        origin = jnp.min(pos, axis=0)
    else:
        origin = jnp.min(jnp.where(mask[:, None], pos, jnp.inf), axis=0)
    cells = jnp.floor((pos - origin) / jnp.float32(size)).astype(jnp.int32)
    cells = jnp.clip(cells, 0, _AXIS_SIZE - 1)
    # z-major packing: ascending id order == the (z, y, x)-lexicographic
    # order of torch_cluster grid_cluster's x-fastest ids, so "last"-mode
    # representatives (sorted by cell id) line up with the reference's
    # consecutive_cluster center order (grouping is packing-independent).
    ids = (cells[:, 2] << (2 * _AXIS_BITS)) | (cells[:, 1] << _AXIS_BITS) | cells[:, 0]
    if mask is not None:
        ids = jnp.where(mask, ids, PAD_CELL)
    return ids


def _mix_bits(x: jax.Array) -> jax.Array:
    """Deterministic 32-bit integer hash (finalizer of murmur3)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


@functools.partial(jax.jit, static_argnames=("capacity", "priority"))
def voxel_representatives(ids: jax.Array, capacity: int,
                          mask: jax.Array | None = None,
                          priority: str = "hash"):
    """Pick one representative point per occupied voxel cell.

    priority="hash" (default): the reference's consecutive_cluster picks an
    arbitrary per-cell point via a racy scatter; here the choice is a
    deterministic hash-priority (pseudo-random but reproducible). When the
    number of occupied cells exceeds ``capacity``, the kept subset is
    likewise hash-ordered — point/cell order in the tile array is spatially
    sorted, so truncating by index would bias the kept centers toward one
    side of the tile.

    priority="last": per-cell representative is the LAST occurrence in
    array order, and kept centers are emitted in ascending cell-id order —
    the deterministic CPU semantics of the reference's consecutive_cluster
    (torch_geometric consecutive.py: serial scatter_ -> last write wins;
    output indexed by sorted unique cell id). Both properties matter for
    parity: the NEXT stage's last-occurrence choice depends on this
    stage's output order. Used by the full-network parity oracle.

    Returns (idx (capacity,) int32, valid (capacity,) bool).
    """
    n = ids.shape[0]
    if mask is not None:
        ids = jnp.where(mask, ids, PAD_CELL)
    if priority == "last":
        order = jnp.argsort(ids, stable=True)  # within a cell: index order
        sorted_ids = ids[order]
        is_last = jnp.concatenate(
            [sorted_ids[1:] != sorted_ids[:-1], jnp.ones((1,), bool)]
        )
        is_rep = is_last & (sorted_ids != PAD_CELL)
        # compact in sorted (cell id) order; overflow drops largest ids
        key = jnp.where(is_rep, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
        kept = jnp.argsort(key)[:capacity]
        valid = key[kept] < n
        idx = order[kept]
        return jnp.where(valid, idx, 0).astype(jnp.int32), valid

    prio = _mix_bits(jnp.arange(n, dtype=jnp.int32))
    # ONE lexicographic (cell id, hash) sort via lax.sort's multi-key mode
    # (vs the previous two chained argsorts). The hash VALUE is the
    # priority: it orders points identically to a rank in hash order
    # (monotone; ties broken by index in both formulations since the sort
    # is stable), so the per-cell representative and the overflow-kept
    # subset are bit-identical to the two-sort version.
    sorted_ids, sorted_prio, order = jax.lax.sort(
        (ids, prio, jnp.arange(n, dtype=jnp.int32)),
        num_keys=2, is_stable=True,
    )
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    is_rep = is_first & (sorted_ids != PAD_CELL)
    # Compact representatives, overflow dropping by hash priority. uint32
    # hash values sort reps ahead of the all-ones sentinel; ties among
    # equal hashes keep the stable (cell-id order) position.
    key = jnp.where(is_rep, sorted_prio, jnp.uint32(0xFFFFFFFF))
    key2, kept_idx = jax.lax.sort(
        (key, order), num_keys=1, is_stable=True
    )
    valid = key2[:capacity] != jnp.uint32(0xFFFFFFFF)
    idx = kept_idx[:capacity]
    return jnp.where(valid, idx, 0).astype(jnp.int32), valid


def voxel_cell_ids_np(pos, size, origin=None):
    """Host/numpy voxel cell ids for plot-scale tiling (64-bit, no packing
    range limit). Used by preprocessing where clouds span hundreds of
    meters (reference preprocessing.py:55-64 equivalent).
    """
    import numpy as np

    pos = np.asarray(pos)
    if origin is None:
        origin = pos.min(axis=0)
    cells = np.floor((pos - origin) / float(size)).astype(np.int64)
    extent = cells.max(axis=0) + 1
    return (cells[:, 0] * extent[1] + cells[:, 1]) * extent[2] + cells[:, 2]
