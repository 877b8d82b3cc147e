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

Rows the tile map cannot cover (cells dropped by min_pts at some scale,
NaN coordinates, single-scale configs) fall back to the exact host
search — typically a sub-percent remainder.

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

QCHUNK = 8192  # queries per kNN block
GROUP = 16  # (query-chunk, tile) pairs per vmapped dispatch: fewer,
# bigger round trips — per-dispatch latency through a tunneled backend
# outweighs the larger transfer
K_PER_SCALE = 32


@functools.partial(jax.jit, static_argnames=("k", "need_d2"))
def _tile_knn(q, s, qmask, smask, k, need_d2):
    idx, d2, valid = jax.vmap(
        lambda qq, ss, qm, sm: knn_masked(
            qq, ss, k=k, query_mask=qm, source_mask=sm, method="fast",
            with_dist=need_d2,
        )
    )(q, s, qmask, smask)
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


def tile_knn_indices(
    tiles: Sequence[Tile],
    order: Sequence[int],
    query_xyz: np.ndarray,
    min_pts: int,
    need_d2: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-scale tile-local kNN of every query point.

    tiles/order: the classified tiles and the deterministic batcher order
    (classified row r of tile ``order[j]`` lives at offset[j] + r).
    Returns (idx, d2, covered): idx (N, 32 * n_scales) int64 rows into the
    classified array, d2 the matching exact squared distances (None when
    ``need_d2=False`` — only the cross-scale top-k merge needs it, and
    skipping it keeps the d2 matrix off the device readback), covered
    (N,) bool — False rows carry garbage and need the host fallback.
    """
    n_q = query_xyz.shape[0]
    scales = sorted({t.grid_size for t in tiles})
    if min_pts < K_PER_SCALE or any(t.cell_id < 0 for t in tiles):
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
                q = np.zeros((GROUP, QCHUNK, 3), np.float32)
                qm = np.zeros((GROUP, QCHUNK), bool)
                s = np.zeros((GROUP, cap, 3), np.float32)
                sm = np.zeros((GROUP, cap), bool)
                for bi, (t, qs) in enumerate(batch):
                    pts = tiles[t].points
                    q[bi, : qs.size] = xyz32[qs]
                    qm[bi, : qs.size] = True
                    s[bi, : len(pts)] = pts[:, :3]
                    sm[bi, : len(pts)] = True
                out = _tile_knn(
                    jnp.asarray(q), jnp.asarray(s), jnp.asarray(qm),
                    jnp.asarray(sm), K_PER_SCALE, need_d2,
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

    # A row is usable when ANY scale covers it fully: scales that missed
    # it (cell dropped by min_pts) get their slot block copied from the
    # first covered scale — duplicated neighbors leave the median
    # unchanged and scale both vote sums equally, so fusion output is
    # identical to using that scale's block alone. Only rows NO scale
    # covers need the host fallback.
    idx_blocks = idx_out.reshape(n_q, n_scales, K_PER_SCALE)
    any_valid = valid_scale.any(axis=1)
    first_valid = np.argmax(valid_scale, axis=1)
    fill_idx = idx_blocks[np.arange(n_q), first_valid]
    if need_d2:
        d2_blocks = d2_out.reshape(n_q, n_scales, K_PER_SCALE)
        fill_d2 = d2_blocks[np.arange(n_q), first_valid]
    for s_i in range(n_scales):
        need = any_valid & ~valid_scale[:, s_i]
        if need.any():
            idx_blocks[need, s_i] = fill_idx[need]
            if need_d2:
                d2_blocks[need, s_i] = fill_d2[need]
    return idx_out, d2_out, any_valid


@functools.partial(jax.jit, static_argnames=("k_out", "any_wood_is_one"))
def _fused_pair_knn(q, qmask, sf, smf, pf, sc, smc, pc_, is_wood, any_wood,
                    k_out, any_wood_is_one):
    """kNN against a (fine, coarse) tile pair AND the median/vote fusion in
    one dispatch: only (Q, 2) [label, pwood] per sample ever leaves the
    device. Semantics of fusion._fuse_chunk (reference predicter.py:113-127)
    over the 32+32 per-scale candidates."""

    def per(qq, qm, s1, sm1, p1, s2, sm2, p2):
        i1, d1, _ = knn_masked(qq, s1, k=K_PER_SCALE, query_mask=qm,
                               source_mask=sm1, method="fast",
                               with_dist=True)
        i2, d2_, _ = knn_masked(qq, s2, k=K_PER_SCALE, query_mask=qm,
                                source_mask=sm2, method="fast",
                                with_dist=True)
        p = jnp.concatenate([p1[i1], p2[i2]], axis=1)  # (Q, 64)
        if k_out < 2 * K_PER_SCALE:
            d = jnp.concatenate([d1, d2_], axis=1)
            _, sel = jax.lax.top_k(-d, k_out)
            p = jnp.take_along_axis(p, sel, axis=1)
        c = (p >= is_wood).astype(p.dtype)
        pwood = jnp.median(p, axis=1)
        if any_wood_is_one:
            vote1 = jnp.sum(jnp.where(c == 1, p, 0.0), axis=1)
            vote0 = jnp.sum(jnp.where(c == 0, p, 0.0), axis=1)
            label = (vote1 > vote0).astype(jnp.float32)
        else:
            label = jnp.any(c > any_wood, axis=1).astype(jnp.float32)
        return label, pwood

    return jax.vmap(per)(q, qmask, sf, smf, pf, sc, smc, pc_)


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
):
    """Fully device-side fusion for the dual-scale configs: per (fine,
    coarse) tile pair, one dispatch runs both per-scale kNNs, gathers the
    candidate probabilities from the pair's own probability vectors, and
    reduces median + vote — no neighbor-index matrix is ever read back
    (the index readback dominated the index-based path's wall time on
    narrow host links).

    probs: (M,) classified wood probabilities in batcher order.
    Returns (N, 2) [label, pwood], or None when this path does not apply
    (callers then use fusion_indices / the host search).
    """
    scales = sorted({t.grid_size for t in tiles})
    k_out = 64 if any_wood == 1 else 32
    if (len(scales) != 2 or min_pts < K_PER_SCALE
            or any(t.cell_id < 0 for t in tiles)):
        return None

    n_q = query_xyz.shape[0]
    xyz32 = query_xyz.astype(np.float32)
    offsets = np.zeros(len(tiles), np.int64)
    off = 0
    for j in order:
        offsets[j] = off
        off += len(tiles[j])

    # per-query tile at each scale (-1 = uncovered)
    tile_of = np.full((n_q, 2), -1, np.int64)
    for si, scale in enumerate(scales):
        by_cell = {
            tiles[t].cell_id: t
            for t in range(len(tiles)) if tiles[t].grid_size == scale
        }
        ids = cell_ids_for(xyz32, float(scale))
        known = np.fromiter(by_cell.keys(), np.int64, len(by_cell))
        tidx = np.fromiter(by_cell.values(), np.int64, len(by_cell))
        so = np.argsort(known)
        known, tidx = known[so], tidx[so]
        pos = np.clip(np.searchsorted(known, ids), 0, len(known) - 1)
        hit = (known[pos] == ids) if len(known) else np.zeros(n_q, bool)
        tile_of[:, si] = np.where(hit, tidx[pos], -1)

    both = (tile_of >= 0).all(axis=1)
    single = (tile_of >= 0).any(axis=1) & ~both
    if k_out == 64:
        # duplicated per-scale candidates keep median and vote ratios
        # identical, so single-coverage rows just use their tile twice
        fv = np.where(tile_of[:, 0] >= 0, tile_of[:, 0], tile_of[:, 1])
        pair_f = np.where(both, tile_of[:, 0], fv)
        pair_c = np.where(both, tile_of[:, 1], fv)
        usable = both | single
    else:
        # k=32: a duplicated tile would double-count in the top-32 merge
        pair_f, pair_c = tile_of[:, 0], tile_of[:, 1]
        usable = both

    cap = _next_cap(max_pts)
    out = np.zeros((n_q, 2), np.float64)
    done = np.zeros(n_q, bool)

    keys = pair_f * (len(tiles) + 1) + pair_c
    qorder = np.argsort(np.where(usable, keys, -1), kind="stable")
    qsorted = qorder[usable[qorder]]
    bounds = np.flatnonzero(np.diff(keys[qsorted])) + 1
    pairs = []
    for grp in np.split(qsorted, bounds):
        if grp.size == 0:
            continue
        tf, tc = int(pair_f[grp[0]]), int(pair_c[grp[0]])
        for s0 in range(0, grp.size, QCHUNK):
            pairs.append((tf, tc, grp[s0 : s0 + QCHUNK]))

    inflight = []
    for g0 in range(0, len(pairs), GROUP):
        batch = pairs[g0 : g0 + GROUP]
        while len(batch) < GROUP:
            batch = batch + [batch[-1][:2] + (np.zeros(0, np.int64),)]
        q = np.zeros((GROUP, QCHUNK, 3), np.float32)
        qm = np.zeros((GROUP, QCHUNK), bool)
        sf = np.zeros((GROUP, cap, 3), np.float32)
        smf = np.zeros((GROUP, cap), bool)
        pfv = np.zeros((GROUP, cap), np.float32)
        sc = np.zeros((GROUP, cap, 3), np.float32)
        smc = np.zeros((GROUP, cap), bool)
        pcv = np.zeros((GROUP, cap), np.float32)
        for bi, (tf, tc, qs) in enumerate(batch):
            q[bi, : qs.size] = xyz32[qs]
            qm[bi, : qs.size] = True
            for (t, s_, sm_, pv_) in ((tf, sf, smf, pfv), (tc, sc, smc, pcv)):
                pts = tiles[t].points
                s_[bi, : len(pts)] = pts[:, :3]
                sm_[bi, : len(pts)] = True
                pv_[bi, : len(pts)] = probs[offsets[t] : offsets[t] + len(pts)]
        res = _fused_pair_knn(
            jnp.asarray(q), jnp.asarray(qm), jnp.asarray(sf),
            jnp.asarray(smf), jnp.asarray(pfv), jnp.asarray(sc),
            jnp.asarray(smc), jnp.asarray(pcv), jnp.float32(is_wood),
            jnp.float32(any_wood), k_out, any_wood == 1,
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
            done[qs] = True

    n_fb = int((~done).sum())
    if n_fb:
        if verbose:
            print(f"fusion: host fallback for {n_fb} uncovered points")
        from pointstowood_tpu.predict.fusion import fuse_labels

        classified_xyz = np.concatenate(
            [tiles[t].points[:, :3] for t in order]
        )
        classified = np.concatenate(
            [classified_xyz, np.zeros((len(probs), 1)), probs[:, None]],
            axis=1,
        )
        rows = np.flatnonzero(~done)
        from scipy.spatial import cKDTree

        _, fb_idx = cKDTree(classified_xyz).query(
            xyz32[rows], k=min(k_out, len(probs)), workers=-1
        )
        if fb_idx.ndim == 1:
            fb_idx = fb_idx[:, None]
        out[rows] = fuse_labels(
            classified, query_xyz[rows], is_wood, any_wood, indices=fb_idx
        )
    return out


def fusion_indices(
    tiles: Sequence[Tile],
    order: Sequence[int],
    classified_xyz: np.ndarray,
    query_xyz: np.ndarray,
    k: int,
    min_pts: int,
    verbose: bool = False,
) -> np.ndarray:
    """(N, k) fusion neighbor rows: tile-local TPU kNN for covered rows,
    exact host search for the remainder. ``k`` must be 32 or 64 (the
    reference's two settings, predicter.py:137)."""
    from pointstowood_tpu.predict.fusion import knn_indices

    n_scales = len({t.grid_size for t in tiles})
    if n_scales * K_PER_SCALE < k:
        # not enough per-scale candidates for this k — host path entirely
        return knn_indices(classified_xyz, query_xyz, k)
    need_d2 = n_scales * K_PER_SCALE > k
    idx, d2, covered = tile_knn_indices(tiles, order, query_xyz, min_pts,
                                        need_d2=need_d2)
    if idx.shape[1] < k:
        return knn_indices(classified_xyz, query_xyz, k)
    if idx.shape[1] > k:
        # keep the k nearest of the per-scale unions by exact distance
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
