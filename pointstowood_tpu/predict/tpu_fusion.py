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
int32 query indices and tile offsets/lengths (~0.5 MB instead of ~10 MB
of re-packed coordinates). On narrow tunneled hosts the upload was 96% of
the warm wall-clock; single-shipment removes it.

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
# queries), and the per-pair capacity buckets keep the kNN matrices at
# the size of the actual tiles instead of one global max_pts cap
PAIR_QCHUNK = 2048
PAIR_GROUP = 16
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
    jax.jit, static_argnames=("k_out", "any_wood_is_one", "cap_f", "cap_c")
)
def _fused_pair_knn(flat_xyz, flat_probs, qxyz, q_idx, q_valid,
                    off_f, len_f, off_c, len_c, is_wood, any_wood,
                    k_out, any_wood_is_one, cap_f, cap_c):
    """kNN against a (fine, coarse) tile pair AND the median/vote fusion in
    one dispatch, reading tile points / probabilities / query coordinates
    from DEVICE-RESIDENT flat arrays: only int32 indices and offsets are
    uploaded per dispatch, and only (Q, 2) [label, pwood] ever comes back.

    ONE kNN over the fine+coarse UNION (each physical point appears once
    per scale, with that scale's probability) selects the k_out nearest
    duplicated candidates — exactly the reference's global search
    semantics (predicter.py:136-137) restricted to the pair's points, for
    BOTH k settings, with no cross-scale merge stage. Invalid slots
    (queries padded, tiles holding fewer than k valid points) are
    excluded from the median and the vote.

    cap_f/cap_c are per-dispatch static capacities (power-of-two bucket of
    the actual tile sizes — a single global max_pts cap wastes up to 8x
    kNN compute on small tiles). flat_xyz/flat_probs carry >= max(cap)
    guard rows so the dynamic tile slices never clamp (clamping would
    silently misalign the mask).
    """
    iota_f = jnp.arange(cap_f, dtype=jnp.int32)
    iota_c = jnp.arange(cap_c, dtype=jnp.int32)

    def per(qi, qv, of, lf, oc, lc):
        qq = qxyz[qi]  # (PAIR_QCHUNK, 3) resident gather
        s = jnp.concatenate([
            jax.lax.dynamic_slice(flat_xyz, (of, 0), (cap_f, 3)),
            jax.lax.dynamic_slice(flat_xyz, (oc, 0), (cap_c, 3)),
        ])
        pu = jnp.concatenate([
            jax.lax.dynamic_slice(flat_probs, (of,), (cap_f,)),
            jax.lax.dynamic_slice(flat_probs, (oc,), (cap_c,)),
        ])
        sm = jnp.concatenate([iota_f < lf, iota_c < lc])
        i, _, vm = knn_masked(
            qq, s, k=k_out, query_mask=qv, source_mask=sm, method="fast",
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

    return jax.vmap(per)(q_idx, q_valid, off_f, len_f, off_c, len_c)


class FusionPlan:
    """Host-side dispatch plan for fuse_on_device. Everything here is
    known BEFORE the model phase produces a probability (tiles, batcher
    order and the query cloud fix every shape), so the predict engine
    builds the plan AND compiles the exact kernel variants concurrently
    with the model phase."""

    __slots__ = ("offsets", "lens", "m", "n_q", "mp", "nqp", "dispatches",
                 "combos", "n_near")

    def __init__(self, offsets, lens, m, n_q, mp, nqp, dispatches, combos,
                 n_near):
        self.offsets = offsets
        self.lens = lens
        self.m = m
        self.n_q = n_q
        self.mp = mp          # padded flat tile-array rows (guarded)
        self.nqp = nqp        # padded query rows
        self.dispatches = dispatches  # [(cap_f, cap_c, [(tf, tc, qs)..])]
        self.combos = combos  # sorted {(cap_f, cap_c)} present
        self.n_near = n_near  # (query, scale) rows on nearest-tile fill


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
    # the pair kernel's exact distances rank those candidates correctly
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
        tile_of[:, si] = np.where(hit, tidx[pos], -1)
        miss = np.flatnonzero(tile_of[:, si] < 0)
        if miss.size:
            n_near += miss.size
            cents = np.stack(
                [tiles[t].points[:, :3].mean(axis=0) for t in scale_tiles]
            )
            nn = _nearest_rows(np.nan_to_num(xyz32[miss]), cents)
            tile_of[miss, si] = np.asarray(scale_tiles, np.int64)[nn]

    # group queries by (fine, coarse) pair, chunk, bucket by capacities
    keys = tile_of[:, 0] * (len(tiles) + 1) + tile_of[:, 1]
    qorder = np.argsort(keys, kind="stable")
    bounds = np.flatnonzero(np.diff(keys[qorder])) + 1
    by_combo = {}  # (cap_f, cap_c) -> [(tf, tc, qs), ...]
    for grp in np.split(qorder, bounds):
        if grp.size == 0:
            continue
        tf, tc = int(tile_of[grp[0], 0]), int(tile_of[grp[0], 1])
        combo = (_next_cap(int(lens[tf])), _next_cap(int(lens[tc])))
        lst = by_combo.setdefault(combo, [])
        for s0 in range(0, grp.size, PAIR_QCHUNK):
            lst.append((tf, tc, grp[s0 : s0 + PAIR_QCHUNK]))

    dispatches = []
    for combo in sorted(by_combo):
        entries = by_combo[combo]
        for g0 in range(0, len(entries), PAIR_GROUP):
            batch = entries[g0 : g0 + PAIR_GROUP]
            while len(batch) < PAIR_GROUP:  # pad the dispatch group
                batch = batch + [batch[-1][:2] + (np.zeros(0, np.int64),)]
            dispatches.append((combo[0], combo[1], batch))

    cap_max = max((max(c) for c in by_combo), default=_next_cap(max_pts))
    return FusionPlan(
        offsets, lens, m, n_q, _next_cap(m + cap_max), _next_cap(n_q),
        dispatches, sorted(by_combo), n_near,
    )


def warm_fuse_on_device(plan: FusionPlan, is_wood: float,
                        any_wood: float) -> None:
    """Pre-compile every fused-pair kernel variant the plan will use
    ((cap_f, cap_c) combos at the plan's resident shapes). The predict
    engine calls this concurrently with the model phase so no compile
    lands on the post-model critical path."""
    k_out = 64 if any_wood == 1 else 32
    zi = jnp.zeros(PAIR_GROUP, jnp.int32)
    fx = jnp.zeros((plan.mp, 3), jnp.float32)
    fp = jnp.zeros(plan.mp, jnp.float32)
    qx = jnp.zeros((plan.nqp, 3), jnp.float32)
    qi = jnp.zeros((PAIR_GROUP, PAIR_QCHUNK), jnp.int32)
    qv = jnp.zeros((PAIR_GROUP, PAIR_QCHUNK), bool)
    for cap_f, cap_c in plan.combos:
        _fused_pair_knn(
            fx, fp, qx, qi, qv, zi, zi, zi, zi,
            jnp.float32(is_wood), jnp.float32(any_wood), k_out,
            any_wood == 1, cap_f, cap_c,
        )


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

    # resident upload: ONE shipment of tile points + probabilities + queries
    fx = np.zeros((plan.mp, 3), np.float32)
    fx[: plan.m] = np.concatenate([tiles[t].points[:, :3] for t in order])
    fp = np.zeros(plan.mp, np.float32)
    fp[: plan.m] = probs
    qx = np.zeros((plan.nqp, 3), np.float32)
    qx[:n_q] = query_xyz.astype(np.float32)  # NaN rows -> invalid -> inert
    flat_xyz = jnp.asarray(fx)
    flat_probs = jnp.asarray(fp)
    qxyz_dev = jnp.asarray(qx)

    out = np.zeros((n_q, 2), np.float64)
    inflight = []
    for cap_f, cap_c, batch in plan.dispatches:
        q_idx = np.zeros((PAIR_GROUP, PAIR_QCHUNK), np.int32)
        q_valid = np.zeros((PAIR_GROUP, PAIR_QCHUNK), bool)
        off_f = np.zeros(PAIR_GROUP, np.int32)
        len_f = np.zeros(PAIR_GROUP, np.int32)
        off_c = np.zeros(PAIR_GROUP, np.int32)
        len_c = np.zeros(PAIR_GROUP, np.int32)
        for bi, (tf, tc, qs) in enumerate(batch):
            q_idx[bi, : qs.size] = qs
            q_valid[bi, : qs.size] = True
            off_f[bi], len_f[bi] = plan.offsets[tf], plan.lens[tf]
            off_c[bi], len_c[bi] = plan.offsets[tc], plan.lens[tc]
        res = _fused_pair_knn(
            flat_xyz, flat_probs, qxyz_dev, jnp.asarray(q_idx),
            jnp.asarray(q_valid), jnp.asarray(off_f), jnp.asarray(len_f),
            jnp.asarray(off_c), jnp.asarray(len_c), jnp.float32(is_wood),
            jnp.float32(any_wood), k_out, any_wood == 1, cap_f, cap_c,
        )
        inflight.append((batch, res))
    for batch, (label, pwood) in inflight:
        label = np.asarray(label)
        pwood = np.asarray(pwood)
        for bi, (tf, tc, qs) in enumerate(batch):
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
