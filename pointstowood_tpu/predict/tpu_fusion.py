"""TPU-native fusion neighbor search.

The reference fuses tile predictions onto the original cloud with a global
pykdtree query of every original point against ALL classified points
(reference: pointstowood/src/predicter.py:136-137) — C/OpenMP host work
that scales with cores, not chips (measured 100+ s single-core for a
1M-point plot against 2M classified rows; it IS the steady-state
bottleneck once the model phase is compiled). SURVEY §2c calls for the
TPU-native replacement ("CPU fallback acceptable only for tests").

The TPU formulation exploits what fusion actually needs: a point's k
nearest classified neighbors are overwhelmingly inside the very tile(s)
that classified its neighborhood — one tile per grid scale. So instead of
one global M x N search, each original point queries its own tile's
classified points per scale (a (8192, tile_capacity) fast-kNN problem,
exactly the Pallas kernel's shape), contributing 32 exact-distance
candidates per scale:

* canonical dual-grid + any_wood==1 (k=64): the 32+32 union IS the
  candidate set — the reference's global 64 drawn from the same two
  duplicated neighborhoods;
* any_wood!=1 (k=32): the nearest 32 of the 64 by exact distance.

DEVICE-RESIDENT LAYOUT (round 3): the classified tile points, their
probabilities, and the query cloud are shipped to the device ONCE per
plot as flat arrays; every (fine, coarse) pair dispatch then carries only
int32 query/candidate row indices (-1 = padding; validity derived on
device). On narrow tunneled hosts re-packed coordinate uploads were 96%
of the warm wall-clock; single-shipment removes them.

DISPATCH PLAN (round 3): plan_fusion chunks each pair group's queries in
Morton order; dense pairs search only the union rows inside the chunk's
bounding box + margin (~4x less kNN work at full occupancy), small pairs
bin-pack into shared entries with merged candidate unions (a candidate
superset per query — closer to the reference's global search), and
entries bucket by candidate capacity with remainders carried into the
next bucket so only the last dispatch pads with empty entries.

Rows whose voxel cell has no tile at some scale (dropped by min_pts) are
assigned the nearest tile of that scale by centroid — their true nearest
classified points live in an adjacent cell, and the pair kernel's exact
distances rank those candidates correctly. Every row is therefore fused
on-device; no host KD-tree fallback exists on this path anymore.

Semantics deviation vs the reference: near tile borders a point's true
nearest neighbors can live in the adjacent tile; the per-scale-local
candidates are then slightly farther. The median/vote over >=32
probability-duplicated neighbors is insensitive to this (measured label
agreement vs the exact host fusion is pinned in tests/test_tpu_fusion.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.data.tiling import Tile, cell_ids_for
from pointstowood_tpu.ops.knn import knn_masked

QCHUNK = 8192  # queries per kNN block (index-based path)
GROUP = 16  # (query-chunk, tile) pairs per vmapped dispatch: fewer,
# bigger round trips — per-dispatch latency through a tunneled backend
# outweighs the larger transfer
K_PER_SCALE = 32
# fused pair-kernel dispatch shape: smaller query chunks keep padding
# waste low (most (fine, coarse) pair groups hold far fewer than 8192
# queries) and shrink each chunk's candidate box, and the per-entry
# capacity buckets keep the kNN matrices at the size of the actual
# candidate sets instead of one global max_pts cap
PAIR_QCHUNK = 1024
PAIR_GROUP = 16


def _cand_bucket(n: int) -> int:
    """Candidate capacity bucket: 2048 floor (the Pallas kernel's minimum
    width), then multiples of 4096 — finer than power-of-two so a 9k
    candidate set pays 12k of kNN width, not 16k."""
    if n <= 2048:
        return 2048
    return -(-n // 4096) * 4096
# stage-2 recall target for the fusion kNNs: the median/vote over >= 32
# probability-duplicated candidates is insensitive to single swapped
# neighbors, so fusion buys latency with a looser target than the model
# kNN (label agreement vs exact host fusion is pinned in tests)
FUSION_RECALL = 0.9


@functools.partial(jax.jit, static_argnames=("k", "need_d2", "cap"))
def _tile_knn(flat_xyz, qxyz, q_idx, q_valid, off, ln, k, need_d2, cap):
    """Per-tile kNN reading tile points and queries from DEVICE-RESIDENT
    flat arrays (uploaded once per plot); the dispatch carries only int32
    query indices and tile offsets/lengths."""
    iota = jnp.arange(cap, dtype=jnp.int32)

    def per(qi, qv, of, lf):
        qq = qxyz[qi]
        s = jax.lax.dynamic_slice(flat_xyz, (of, 0), (cap, 3))
        sm = iota < lf
        return knn_masked(
            qq, s, k=k, query_mask=qv, source_mask=sm, method="fast",
            with_dist=need_d2,
        )

    idx, d2, valid = jax.vmap(per)(q_idx, q_valid, off, ln)
    # per-ROW validity suffices: min_pts >= k guarantees every valid query
    # gets k valid slots, so slots only die wholesale (padded queries).
    # Reducing on device keeps the d2/valid matrices out of the readback —
    # the index matrix is the only bulk transfer on the k=64 path.
    row_valid = valid.all(axis=-1)
    if need_d2:
        return idx, d2.astype(jnp.float32), row_valid
    return idx, row_valid


def _next_cap(n: int) -> int:
    cap = 2048  # Pallas group-min floor
    while cap < n:
        cap *= 2
    return cap


def _nearest_rows(queries: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Nearest row of ``points`` (tile centroids) per query. Typical case:
    ~0.1% uncovered rows vs a few thousand centroids — chunked numpy
    brute force, no index build. Degenerate case (most of the plot
    uncovered, e.g. aggressive min_pts): a KD-tree over the CENTROIDS
    (thousands of rows, microsecond build — not the all-classified-points
    tree this path replaced)."""
    if len(queries) * len(points) > 2e9:
        from scipy.spatial import cKDTree

        return cKDTree(points).query(queries, k=1, workers=-1)[1]
    out = np.empty(len(queries), np.int64)
    step = 4096
    for s in range(0, len(queries), step):
        q = queries[s : s + step]
        d2 = ((q[:, None, :] - points[None, :, :]) ** 2).sum(-1)
        out[s : s + step] = np.argmin(d2, axis=1)
    return out


def tile_knn_indices(
    tiles: Sequence[Tile],
    order: Sequence[int],
    query_xyz: np.ndarray,
    min_pts: int,
    need_d2: bool = True,
    cluster_features: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-scale tile-local kNN of every query point.

    tiles/order: the classified tiles and the deterministic batcher order
    (classified row r of tile ``order[j]`` lives at offset[j] + r).
    Returns (idx, d2, covered): idx (N, 32 * n_scales) int64 rows into the
    classified array, d2 the matching exact squared distances (None when
    ``need_d2=False`` — only the cross-scale top-k merge needs it, and
    skipping it keeps the d2 matrix off the device readback), covered
    (N,) bool — False rows carry garbage and need the host fallback.

    ``cluster_features`` tilings pack cell ids from the full feature
    tensor — incomparable with the xyz-only ids recomputed here — so the
    path declines wholesale (all rows uncovered).
    """
    n_q = query_xyz.shape[0]
    scales = sorted({t.grid_size for t in tiles})
    if (min_pts < K_PER_SCALE or cluster_features
            or any(t.cell_id < 0 for t in tiles)):
        return (np.zeros((n_q, 0), np.int64), np.zeros((n_q, 0)),
                np.zeros(n_q, bool))

    offsets = np.zeros(len(tiles), np.int64)
    off = 0
    for j in order:
        offsets[j] = off
        off += len(tiles[j])

    xyz32 = query_xyz.astype(np.float32)
    n_scales = len(scales)
    k_total = K_PER_SCALE * n_scales
    idx_out = np.zeros((n_q, k_total), np.int64)
    d2_out = (
        np.full((n_q, k_total), np.inf, np.float32) if need_d2 else None
    )
    valid_scale = np.zeros((n_q, n_scales), bool)

    # resident upload: ONE shipment of tile points + queries; dispatches
    # then carry only int32 metadata (same design as fuse_on_device)
    m = int(off)
    cap_max = _next_cap(max(len(t) for t in tiles))
    mp = _next_cap(m + cap_max)
    fx = np.zeros((mp, 3), np.float32)
    fx[:m] = np.concatenate([tiles[t].points[:, :3] for t in order])
    qx = np.zeros((_next_cap(n_q), 3), np.float32)
    qx[:n_q] = xyz32  # NaN rows stay NaN -> invalid -> host fallback
    flat_xyz = jnp.asarray(fx)
    qxyz_dev = jnp.asarray(qx)
    lens = np.array([len(t) for t in tiles], np.int32)

    for si, scale in enumerate(scales):
        by_cell = {
            tiles[t].cell_id: t
            for t in range(len(tiles)) if tiles[t].grid_size == scale
        }
        ids = cell_ids_for(xyz32, float(scale))
        # vectorized cell -> tile lookup
        known = np.fromiter(by_cell.keys(), np.int64, len(by_cell))
        tidx_of = np.fromiter(by_cell.values(), np.int64, len(by_cell))
        sorter = np.argsort(known)
        known, tidx_of = known[sorter], tidx_of[sorter]
        pos = np.searchsorted(known, ids)
        pos_c = np.clip(pos, 0, len(known) - 1)
        hit = known[pos_c] == ids
        tile_of_query = np.where(hit, tidx_of[pos_c], -1)

        # group queries by tile, chunk, and bucket chunks by capacity
        work = {}  # cap -> list of (tile_idx, query_indices_chunk)
        qorder = np.argsort(tile_of_query, kind="stable")
        qsorted = qorder[tile_of_query[qorder] >= 0]
        bounds = np.flatnonzero(np.diff(tile_of_query[qsorted])) + 1
        for grp in np.split(qsorted, bounds):
            if grp.size == 0:
                continue
            t = int(tile_of_query[grp[0]])
            cap = _next_cap(len(tiles[t]))
            for s0 in range(0, grp.size, QCHUNK):
                work.setdefault(cap, []).append((t, grp[s0 : s0 + QCHUNK]))

        col = si * K_PER_SCALE
        # launch every dispatch group asynchronously, then drain: a
        # per-group readback would serialize ~29 ms of RTT per group on a
        # tunneled backend
        inflight = []
        for cap, pairs in sorted(work.items()):
            for g0 in range(0, len(pairs), GROUP):
                batch = pairs[g0 : g0 + GROUP]
                while len(batch) < GROUP:  # pad the dispatch group
                    batch = batch + [batch[-1][:1] + (np.zeros(0, np.int64),)]
                q_idx = np.zeros((GROUP, QCHUNK), np.int32)
                q_valid = np.zeros((GROUP, QCHUNK), bool)
                offs = np.zeros(GROUP, np.int32)
                lns = np.zeros(GROUP, np.int32)
                for bi, (t, qs) in enumerate(batch):
                    q_idx[bi, : qs.size] = qs
                    q_valid[bi, : qs.size] = True
                    offs[bi], lns[bi] = offsets[t], lens[t]
                out = _tile_knn(
                    flat_xyz, qxyz_dev, jnp.asarray(q_idx),
                    jnp.asarray(q_valid), jnp.asarray(offs),
                    jnp.asarray(lns), K_PER_SCALE, need_d2, cap,
                )
                inflight.append((batch, out))
        for batch, out in inflight:
            if need_d2:
                idx, d2, row_valid = out
                d2 = np.asarray(d2)
            else:
                idx, row_valid = out
                d2 = None
            idx = np.asarray(idx)
            row_valid = np.asarray(row_valid)
            for bi, (t, qs) in enumerate(batch):
                if qs.size == 0:
                    continue
                v = row_valid[bi, : qs.size]
                rows = idx[bi, : qs.size].astype(np.int64) + offsets[t]
                idx_out[qs, col : col + K_PER_SCALE] = np.where(
                    v[:, None], rows, 0
                )
                if need_d2:
                    d2_out[qs, col : col + K_PER_SCALE] = np.where(
                        v[:, None], d2[bi, : qs.size], np.inf
                    )
                valid_scale[qs, si] = v

    # A row is usable when ANY scale covers it fully. Scales that missed
    # it (cell dropped by min_pts) get their slot block copied from the
    # first covered scale with +inf distances: on the k=64 no-merge path
    # duplicated neighbors leave median/vote invariant, and on the k=32
    # merge path the +inf distances make the top-k select exactly the
    # covered scale's 32 DISTINCT neighbors instead of double-counting 16
    # duplicated ones. Only rows NO scale covers need the host fallback.
    idx_blocks = idx_out.reshape(n_q, n_scales, K_PER_SCALE)
    any_valid = valid_scale.any(axis=1)
    first_valid = np.argmax(valid_scale, axis=1)
    fill_idx = idx_blocks[np.arange(n_q), first_valid]
    for s_i in range(n_scales):
        need = any_valid & ~valid_scale[:, s_i]
        if need.any():
            idx_blocks[need, s_i] = fill_idx[need]
            if need_d2:
                d2_out.reshape(n_q, n_scales, K_PER_SCALE)[need, s_i] = np.inf
    return idx_out, d2_out, any_valid


@functools.partial(
    jax.jit, static_argnames=("k_out", "any_wood_is_one")
)
def _fused_pair_knn(flat_xyz, flat_probs, qxyz, q_idx,
                    cand_idx, is_wood, any_wood,
                    k_out, any_wood_is_one):
    """kNN against a gathered CANDIDATE row set AND the median/vote fusion
    in one dispatch, reading tile points / probabilities / query
    coordinates from DEVICE-RESIDENT flat arrays: only int32 indices are
    uploaded per dispatch, and only (Q, 2) [label, pwood] ever comes back.

    Candidates are the fine+coarse pair UNION (each physical point appears
    once per scale, with that scale's probability) — the reference's
    global duplicated-candidate search (predicter.py:136-137) restricted
    to the pair's points, for BOTH k settings, with no cross-scale merge —
    or, for dense pairs, the plan's margin-bounded spatial subset of that
    union (see plan_fusion). Invalid slots (padded queries, padded
    candidate rows) are excluded from the median and the vote.

    The candidate capacity is the cand_idx array width (a power-of-two
    bucket chosen by the plan): one compile per bucket, and small pairs
    never pay a global max_pts-sized kNN.

    Padded slots in q_idx / cand_idx carry -1: validity is derived on
    device (idx >= 0) instead of shipping separate bool planes — the
    upload is ~20% of the per-dispatch bytes on a tunneled host.
    """

    def per(qi, ci):
        qv = qi >= 0
        cv = ci >= 0
        qi = jnp.maximum(qi, 0)
        ci = jnp.maximum(ci, 0)
        qq = qxyz[qi]  # (PAIR_QCHUNK, 3) resident gather
        s = flat_xyz[ci]  # (cap, 3) resident gather
        pu = flat_probs[ci]
        i, _, vm = knn_masked(
            qq, s, k=k_out, query_mask=qv, source_mask=cv, method="fast",
            recall_target=FUSION_RECALL, with_dist=False,
        )
        p = pu[i]  # (Q, k_out)
        # masked median: sort valid probabilities to the front, average the
        # two middle ranks of the VALID count (np.median semantics)
        cnt = vm.sum(axis=1)
        ps = jnp.sort(jnp.where(vm, p, jnp.inf), axis=1)
        lo = jnp.clip((cnt - 1) // 2, 0, k_out - 1)
        hi = jnp.clip(cnt // 2, 0, k_out - 1)
        med = (
            jnp.take_along_axis(ps, lo[:, None], axis=1)[:, 0]
            + jnp.take_along_axis(ps, hi[:, None], axis=1)[:, 0]
        ) * 0.5
        pwood = jnp.where(cnt > 0, med, 0.0)
        c = (p >= is_wood).astype(p.dtype)
        if any_wood_is_one:
            vote1 = jnp.sum(jnp.where(vm & (c == 1), p, 0.0), axis=1)
            vote0 = jnp.sum(jnp.where(vm & (c == 0), p, 0.0), axis=1)
            label = (vote1 > vote0).astype(jnp.float32)
        else:
            label = jnp.any(vm & (c > any_wood), axis=1).astype(jnp.float32)
        return label, pwood

    return jax.vmap(per)(q_idx, cand_idx)


class FusionPlan:
    """Host-side dispatch plan for fuse_on_device. Everything here is
    known BEFORE the model phase produces a probability (tiles, batcher
    order and the query cloud fix every shape), so the predict engine
    builds the plan AND compiles the exact kernel variants concurrently
    with the model phase."""

    __slots__ = ("m", "n_q", "mp", "nqp", "flat_xyz", "dispatches",
                 "combos", "n_near", "n_split")

    def __init__(self, m, n_q, mp, nqp, flat_xyz, dispatches, combos,
                 n_near, n_split):
        self.m = m
        self.n_q = n_q
        self.mp = mp          # padded flat tile-array rows
        self.nqp = nqp        # padded query rows
        self.flat_xyz = flat_xyz  # (mp, 3) np — classified xyz, batcher order
        self.dispatches = dispatches  # [(cap, [(qs, cand_rows), ...])]
        self.combos = combos  # sorted candidate-capacity buckets present
        self.n_near = n_near  # (query, scale) rows on nearest-tile fill
        self.n_split = n_split  # queries routed through octant subsets


# dense pairs: fine+coarse unions above this get per-chunk spatial
# candidate subsets instead of brute force over the full union
SPLIT_THRESHOLD = 8192
# candidate box margin (m) around each query chunk's bounding box; must
# exceed the typical 64-NN radius (~0.1-0.3 m at TLS densities) with slack
SPLIT_MARGIN = 0.35
# candidate floor: below this the subset is too sparse to trust (the
# margin may clip true neighbors) — fall back to the full union
SPLIT_MIN_CAND = 1024
# Morton cell size (m) for spatial query ordering
_MORTON_CELL = 0.5


def _morton_order(xyz: np.ndarray) -> np.ndarray:
    """Sort order by 3-D Morton code at _MORTON_CELL resolution: chunks of
    consecutive queries become spatially TIGHT boxes (plain cell-id sort
    produces thin z-slabs spanning the whole tile footprint)."""
    c = np.floor((xyz - xyz.min(axis=0)) / _MORTON_CELL).astype(np.uint64)
    c = np.minimum(c, (1 << 16) - 1)

    def spread(v):  # interleave-ready: 16 bits -> every 3rd bit of 48
        v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v

    code = spread(c[:, 0]) | (spread(c[:, 1]) << np.uint64(1)) \
        | (spread(c[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


def _pair_entries(qs, q_xyz, rows, pair_xyz):
    """Split one (fine, coarse) pair group into kernel entries.

    qs: query indices of the pair group; q_xyz their coordinates
    (NaN-free); rows: classified rows of the pair union; pair_xyz their
    coordinates. Dense unions order the queries by Morton code and chunk
    them into full PAIR_QCHUNK blocks; each chunk searches only the union
    rows inside its query bounding box + SPLIT_MARGIN — a ~4x candidate
    cut for the dominant max_pts-sized pairs at full chunk occupancy,
    with the full union as the sparse fallback.
    Returns ([(qs_chunk, cand_rows)], n_split_queries).
    """
    out = []
    if rows.size <= SPLIT_THRESHOLD or qs.size < 256:
        for s0 in range(0, qs.size, PAIR_QCHUNK):
            out.append((qs[s0 : s0 + PAIR_QCHUNK], rows))
        return out, 0
    order = _morton_order(q_xyz)
    n_split = 0
    for s0 in range(0, qs.size, PAIR_QCHUNK):
        sel = order[s0 : s0 + PAIR_QCHUNK]
        sub_xyz = q_xyz[sel]
        lo = sub_xyz.min(axis=0) - SPLIT_MARGIN
        hi = sub_xyz.max(axis=0) + SPLIT_MARGIN
        inside = np.all((pair_xyz >= lo) & (pair_xyz <= hi), axis=1)
        cand = rows[inside]
        if (cand.size < SPLIT_MIN_CAND
                or _cand_bucket(cand.size) >= _cand_bucket(rows.size)):
            cand = rows  # subset buys nothing or is too sparse to trust
        else:
            n_split += sel.size
        out.append((qs[sel], cand))
    return out, n_split


def plan_fusion(
    tiles: Sequence[Tile],
    order: Sequence[int],
    query_xyz: np.ndarray,
    min_pts: int,
    max_pts: int,
    cluster_features: bool = False,
):
    """Build the FusionPlan (pure host work: cell lookups, pair grouping,
    capacity bucketing). Returns None when the device path does not apply
    (callers then use fusion_indices / the host search). ``cluster_features``
    tilings are declined: their cell ids are packed from the full feature
    tensor and are incomparable with the xyz-only ids recomputed here."""
    scales = sorted({t.grid_size for t in tiles})
    if (len(scales) != 2 or min_pts < K_PER_SCALE or cluster_features
            or any(t.cell_id < 0 for t in tiles)):
        return None

    n_q = query_xyz.shape[0]
    xyz32 = query_xyz.astype(np.float32)
    offsets = np.zeros(len(tiles), np.int64)
    off = 0
    for j in order:
        offsets[j] = off
        off += len(tiles[j])
    m = int(off)
    lens = np.array([len(t) for t in tiles], np.int32)

    # per-query tile at each scale; rows whose cell has no tile at a scale
    # (dropped by min_pts) take the nearest tile OF THAT SCALE by centroid
    # — their true nearest classified points are in an adjacent cell, and
    # the pair kernel's exact distances rank those candidates correctly.
    # Non-finite query rows are excluded from planning ENTIRELY (they fuse
    # to inert zeros): their coordinates must not perturb the Morton
    # chunking or the candidate boxes of valid queries.
    finite = np.isfinite(xyz32).all(axis=1)
    tile_of = np.full((n_q, 2), -1, np.int64)
    n_near = 0
    for si, scale in enumerate(scales):
        scale_tiles = [
            t for t in range(len(tiles)) if tiles[t].grid_size == scale
        ]
        by_cell = {tiles[t].cell_id: t for t in scale_tiles}
        ids = cell_ids_for(xyz32, float(scale))
        known = np.fromiter(by_cell.keys(), np.int64, len(by_cell))
        tidx = np.fromiter(by_cell.values(), np.int64, len(by_cell))
        so = np.argsort(known)
        known, tidx = known[so], tidx[so]
        pos = np.clip(np.searchsorted(known, ids), 0, len(known) - 1)
        hit = (known[pos] == ids) if len(known) else np.zeros(n_q, bool)
        tile_of[:, si] = np.where(hit & finite, tidx[pos], -1)
        miss = np.flatnonzero((tile_of[:, si] < 0) & finite)
        if miss.size:
            n_near += miss.size
            cents = np.stack(
                [tiles[t].points[:, :3].mean(axis=0) for t in scale_tiles]
            )
            nn = _nearest_rows(xyz32[miss], cents)
            tile_of[miss, si] = np.asarray(scale_tiles, np.int64)[nn]

    # flat classified xyz in batcher order — the plan needs it for the
    # spatial candidate subsets, and fuse_on_device ships it as the
    # device-resident array
    mp = _next_cap(m)
    flat_xyz = np.zeros((mp, 3), np.float32)
    flat_xyz[:m] = np.concatenate([tiles[t].points[:, :3] for t in order])

    # group queries by (fine, coarse) pair, build candidate entries
    keys = tile_of[:, 0] * (len(tiles) + 1) + tile_of[:, 1]
    qorder = np.argsort(keys, kind="stable")
    bounds = np.flatnonzero(np.diff(keys[qorder])) + 1
    by_cap = {}  # candidate capacity bucket -> [(qs, cand_rows), ...]
    n_split = 0
    # small pairs bin-pack into shared entries (merged queries + merged
    # candidate union): a candidate SUPERSET of each query's own pair is
    # semantically safe (the kNN just sees more of the global candidate
    # set), and packing deletes the half-empty small-pair dispatches
    pack_q, pack_c, pack_nq, pack_nc = [], [], 0, 0

    def flush_pack():
        nonlocal pack_q, pack_c, pack_nq, pack_nc
        if pack_nq:
            qs = np.concatenate(pack_q)
            cand = np.concatenate(pack_c)
            by_cap.setdefault(_cand_bucket(cand.size), []).append((qs, cand))
        pack_q, pack_c, pack_nq, pack_nc = [], [], 0, 0

    for grp in np.split(qorder, bounds):
        if grp.size == 0 or tile_of[grp[0], 0] < 0:
            continue  # non-finite rows: no plan entry, fuse to inert zeros
        tf, tc = int(tile_of[grp[0], 0]), int(tile_of[grp[0], 1])
        of, lf = int(offsets[tf]), int(lens[tf])
        oc, lc = int(offsets[tc]), int(lens[tc])
        rows = np.concatenate([
            np.arange(of, of + lf, dtype=np.int32),
            np.arange(oc, oc + lc, dtype=np.int32),
        ])
        if grp.size <= PAIR_QCHUNK // 2 and rows.size <= SPLIT_THRESHOLD // 2:
            if (pack_nq + grp.size > PAIR_QCHUNK
                    or pack_nc + rows.size > SPLIT_THRESHOLD):
                flush_pack()
            pack_q.append(grp)
            pack_c.append(rows)
            pack_nq += grp.size
            pack_nc += rows.size
            continue
        entries, ns = _pair_entries(grp, xyz32[grp], rows, flat_xyz[rows])
        n_split += ns
        for qs, cand in entries:
            by_cap.setdefault(_cand_bucket(cand.size), []).append((qs, cand))
    flush_pack()

    # batch entries into dispatch groups per capacity, carrying remainder
    # entries UP into the next capacity bucket (an entry runs fine at any
    # cap >= its candidate count) so only the final dispatch ever pads
    # with empty entries
    dispatches = []
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int32))
    carry = []
    cap = 2048
    for cap in sorted(by_cap):
        entries = carry + by_cap[cap]
        full = len(entries) // PAIR_GROUP * PAIR_GROUP
        for g0 in range(0, full, PAIR_GROUP):
            dispatches.append((cap, entries[g0 : g0 + PAIR_GROUP]))
        carry = entries[full:]
    if carry:
        while len(carry) < PAIR_GROUP:
            carry = carry + [empty]
        dispatches.append((cap, carry))

    return FusionPlan(
        m, n_q, mp, _next_cap(n_q), flat_xyz, dispatches,
        sorted({c for c, _ in dispatches}), n_near, n_split,
    )


def warm_fuse_on_device(plan: FusionPlan, is_wood: float,
                        any_wood: float) -> None:
    """Pre-compile every fused-pair kernel variant the plan will use
    (candidate-capacity buckets at the plan's resident shapes). The
    predict engine calls this concurrently with the model phase so no
    compile lands on the post-model critical path."""
    import concurrent.futures

    k_out = 64 if any_wood == 1 else 32
    fx = jnp.zeros((plan.mp, 3), jnp.float32)
    fp = jnp.zeros(plan.mp, jnp.float32)
    qx = jnp.zeros((plan.nqp, 3), jnp.float32)
    qi = jnp.zeros((PAIR_GROUP, PAIR_QCHUNK), jnp.int32)

    def one(cap):
        _fused_pair_knn(
            fx, fp, qx, qi,
            jnp.zeros((PAIR_GROUP, cap), jnp.int32),
            jnp.float32(is_wood), jnp.float32(any_wood), k_out,
            any_wood == 1,
        )

    # several capacity variants compile per plan; overlap them (the
    # compile service pipelines requests)
    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(one, plan.combos))


def fuse_on_device(
    tiles: Sequence[Tile],
    order: Sequence[int],
    probs: np.ndarray,
    query_xyz: np.ndarray,
    is_wood: float,
    any_wood: float,
    min_pts: int,
    max_pts: int,
    verbose: bool = False,
    cluster_features: bool = False,
    plan: FusionPlan | None = None,
):
    """Fully device-side fusion for the dual-scale configs: per (fine,
    coarse) tile pair, one dispatch runs the union kNN, gathers the
    candidate probabilities from the pair's own probability vectors, and
    reduces median + vote — no neighbor-index matrix is ever read back.
    Tile points, probabilities, and the query cloud live on the device in
    flat resident arrays uploaded once per plot; dispatches carry only
    int32 metadata.

    probs: (M,) classified wood probabilities in batcher order.
    Returns (N, 2) [label, pwood], or None when this path does not apply
    (callers then use fusion_indices / the host search). Pass a pre-built
    ``plan`` (plan_fusion) to skip the host planning work here.
    """
    if plan is None:
        plan = plan_fusion(tiles, order, query_xyz, min_pts, max_pts,
                           cluster_features=cluster_features)
    if plan is None:
        return None
    k_out = 64 if any_wood == 1 else 32
    n_q = plan.n_q
    if verbose and plan.n_near:
        print(f"fusion: nearest-tile assignment for {plan.n_near} uncovered "
              f"(query, scale) rows — fused on-device, no host search")
    if verbose and plan.n_split:
        print(f"fusion: {plan.n_split} queries on octant candidate subsets")

    # resident upload: ONE shipment of tile points + probabilities + queries
    fp = np.zeros(plan.mp, np.float32)
    fp[: plan.m] = probs
    qx = np.zeros((plan.nqp, 3), np.float32)
    qx[:n_q] = query_xyz.astype(np.float32)  # NaN rows -> invalid -> inert
    flat_xyz = jnp.asarray(plan.flat_xyz)
    flat_probs = jnp.asarray(fp)
    qxyz_dev = jnp.asarray(qx)

    out = np.zeros((n_q, 2), np.float64)
    inflight = []
    for cap, batch in plan.dispatches:
        q_idx = np.full((PAIR_GROUP, PAIR_QCHUNK), -1, np.int32)
        cand_idx = np.full((PAIR_GROUP, cap), -1, np.int32)
        for bi, (qs, cand) in enumerate(batch):
            q_idx[bi, : qs.size] = qs
            cand_idx[bi, : cand.size] = cand
        res = _fused_pair_knn(
            flat_xyz, flat_probs, qxyz_dev, jnp.asarray(q_idx),
            jnp.asarray(cand_idx), jnp.float32(is_wood),
            jnp.float32(any_wood), k_out, any_wood == 1,
        )
        inflight.append((batch, res))
    for batch, (label, pwood) in inflight:
        label = np.asarray(label)
        pwood = np.asarray(pwood)
        for bi, (qs, _) in enumerate(batch):
            if qs.size == 0:
                continue
            out[qs, 0] = label[bi, : qs.size]
            out[qs, 1] = pwood[bi, : qs.size]
    return out


def fusion_indices(
    tiles: Sequence[Tile],
    order: Sequence[int],
    classified_xyz: np.ndarray,
    query_xyz: np.ndarray,
    k: int,
    min_pts: int,
    verbose: bool = False,
    cluster_features: bool = False,
) -> np.ndarray:
    """(N, k) fusion neighbor rows: tile-local TPU kNN for covered rows,
    exact host search for the remainder. ``k`` must be 32 or 64 (the
    reference's two settings, predicter.py:137)."""
    from pointstowood_tpu.predict.fusion import knn_indices

    n_scales = len({t.grid_size for t in tiles})
    if n_scales * K_PER_SCALE < k or cluster_features:
        # not enough per-scale candidates for this k (or incomparable
        # cluster_features cell ids) — host path entirely
        return knn_indices(classified_xyz, query_xyz, k)
    need_d2 = n_scales * K_PER_SCALE > k
    idx, d2, covered = tile_knn_indices(tiles, order, query_xyz, min_pts,
                                        need_d2=need_d2)
    if idx.shape[1] < k:
        return knn_indices(classified_xyz, query_xyz, k)
    if idx.shape[1] > k:
        # keep the k nearest of the per-scale unions by exact distance
        # (scale-fill blocks carry +inf, so single-coverage rows select
        # exactly their covered block)
        part = np.argpartition(d2, k - 1, axis=1)[:, :k]
        idx = np.take_along_axis(idx, part, axis=1)
    out = idx[:, :k]
    n_fallback = int((~covered).sum())
    if n_fallback:
        if verbose:
            print(f"fusion: host fallback for {n_fallback} uncovered points")
        rows = np.flatnonzero(~covered)
        if n_fallback < 100_000:
            # exact scipy path: one tree build beats the grid search's
            # per-source setup when only a sliver of rows needs it
            from scipy.spatial import cKDTree

            _, fb = cKDTree(classified_xyz).query(
                query_xyz[rows], k=k, workers=-1
            )
            out[rows] = fb if k > 1 else fb[:, None]
        else:
            out[rows] = knn_indices(classified_xyz, query_xyz[rows], k)
    return out
