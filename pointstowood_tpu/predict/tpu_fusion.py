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

ZERO-UPLOAD LAYOUT (round 3): the measured tunneled-host link runs at
~10 MB/s, so BYTES MOVED — not kNN FLOPs (~0.3 s of a 7 s phase) —
dominate plot-scale fusion. Three rules follow:

* the flat classified-point / probability arrays are built ON DEVICE
  during the model phase (FlatSink: each batch's already-uploaded
  positions and freshly computed probabilities are written into donated
  flat buffers at the batch's static layout offset) — the tile points
  are never re-uploaded and the probabilities are never read back;
* queries are mostly NOT shipped at all: a query point that survived
  tiling IS a row of its fine tile, and tiles carry their original-row
  indices (Tile.indices), so whole-tile query chunks read their
  coordinates straight from the resident flat array; only the rows the
  tiling dropped (subsampled-out, min_pts) upload as a small extras
  tail. Each dispatch then carries only 6 int32 scalars per entry
  (query offset/count + fine/coarse region offset/length);
* every dispatch accumulates its (label, pwood) — packed into ONE
  uint16 as (label << 11) | round(pwood * 2046) — into a donated device
  buffer; a single readback at the end returns all results (lossless:
  payload-path medians live on the 1/2046 grid).

A host-upload fallback (FlatSink unavailable: multi-device mesh, direct
test calls) builds the same flat layout host-side and uploads it once.

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
import os
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.data.tiling import (
    NAN_CELL, Tile, cell_ids_for, cell_ids_multi,
)
from pointstowood_tpu.ops.knn import knn_masked

QCHUNK = 8192  # queries per kNN block (index-based path)
GROUP = 16  # (query-chunk, tile) pairs per vmapped dispatch: fewer,
# bigger round trips — per-dispatch latency through a tunneled backend
# outweighs the larger transfer
K_PER_SCALE = 32
# fused pair-kernel dispatch shape: smaller query chunks keep padding
# waste low (most (fine, coarse) pair groups hold far fewer than 8192
# queries); padding costs only kNN compute and query-slot upload, both
# cheap next to the per-plot fixed transfers
PAIR_QCHUNK = 1024
# largest stack height (entries) per fused-pair dispatch: bounds the
# batched (h, cap_f + cap_c, 3) source-slice intermediate to ~200 MB HBM
PAIR_MAX_STACK = 512
# fused-pair kernels exist only at these static source-slice sizes: a
# per-tile pow2 cap set yields up to 16 (cap_f, cap_c) executables, and
# every DISTINCT executable in the dispatch loop costs a ~30 ms switch
# through the relay (scripts/pair_combo_probe.py) plus a compile. Few
# sizes bound the loop; reading past a tile's true region is masked by
# len and stays in-bounds because the extras tail is at least
# FUSION_CAPS[-1] rows and flat_probs ships padded to match. Coverage
# must include the largest batcher capacity. Env-overridable
# (``TSP_FUSION_CAPS=2048,8192,16384``) for cap-set A/Bs; each extra cap
# trades masked-candidate kNN scan for executable switches + warm-up
# compiles, so the right set is host-dependent (BASELINE.md round-4).
def _parse_fusion_caps(raw: str) -> tuple:
    """Validated, ascending fusion cap set. _fusion_cap() rounds UP to the
    first covering cap and the extras-tail/in-bounds invariants assume the
    last element is the maximum, so an unsorted or malformed set must fail
    loudly here, not corrupt candidate scans later."""
    try:
        caps = tuple(sorted({int(c) for c in raw.split(",") if c.strip()}))
    except ValueError as e:
        raise ValueError(
            f"TSP_FUSION_CAPS must be comma-separated integers, got {raw!r}"
        ) from e
    if not caps or caps[0] <= 0:
        raise ValueError(
            f"TSP_FUSION_CAPS entries must be positive, got {raw!r}")
    return caps


_FUSION_CAPS: tuple | None = None


def fusion_caps() -> tuple:
    """The active fusion cap set, memoized per process. TSP_FUSION_CAPS
    overrides; unset, the measured host regime decides (utils/host_regime):
    two caps through a relay (each extra cap costs ~30 ms/switch + a
    warm-up compile there), three on a local-PJRT host (the third cap cuts
    the masked-candidate kNN scan — BASELINE.md round-4 projects ~325 ms
    of the 1.56 s device floor back)."""
    global _FUSION_CAPS
    if _FUSION_CAPS is None:
        raw = os.environ.get("TSP_FUSION_CAPS")
        if raw is None:
            from pointstowood_tpu.utils.host_regime import host_regime

            raw = ("2048,16384" if host_regime() == "relay"
                   else "2048,8192,16384")
        _FUSION_CAPS = _parse_fusion_caps(raw)
    return _FUSION_CAPS


def _fusion_cap(c: int) -> int:
    """Smallest fusion cap covering c. Rounding DOWN would make the pair
    kernel scan only cap rows of a longer source region — silently wrong
    fusion — so uncovered capacities are a hard error (checked again at
    plan-build time against the actual tile layout)."""
    caps = fusion_caps()
    for fc in caps:
        if c <= fc:
            return fc
    raise ValueError(
        f"tile capacity {c} exceeds every fusion cap {caps}; set "
        f"TSP_FUSION_CAPS to cover the batcher's largest capacity")


def _stack_chunks(n: int) -> list:
    """Decompose a combo's ``n`` entries into <= 2 power-of-two dispatch
    stacks (plus PAIR_MAX_STACK-sized full chunks for huge combos):
    [(padded_height, real_entries), ...]. Power-of-two heights keep the
    executable set small and reusable across plots; <= 2 chunks per combo
    keeps the padded-compute waste below one real chunk."""
    chunks = []
    while n > PAIR_MAX_STACK:
        chunks.append((PAIR_MAX_STACK, PAIR_MAX_STACK))
        n -= PAIR_MAX_STACK
    if n <= 0:
        return chunks
    up = 1 << max(n - 1, 0).bit_length()  # next pow2 >= n
    if n <= 16 or up == n:
        chunks.append((up, n))
    else:
        half = up >> 1  # largest pow2 < n
        chunks.append((half, half))
        r = n - half
        chunks.append((1 << max(r - 1, 0).bit_length(), r))
    return chunks
# stage-2 recall target for the fusion kNNs: the median/vote over >= 32
# probability-duplicated candidates is insensitive to single swapped
# neighbors, so fusion buys latency with a looser target than the model
# kNN (label agreement vs exact host fusion is pinned in tests).
# A/B on a 1M-pt plot with a sharp structured probability field
# (scripts/fusion_recall_probe.py, 2026-08-18): r=0.8 vs r=0.9 label
# agreement 0.99631, |d pwood| p99 0.035, fusion warm 2.59 s -> 1.99 s
# (recall_target drives approx_min_k's PartialReduce width, the
# dominant cost of the stage-2 select); r=0.7 saves nothing more.
FUSION_RECALL = 0.8


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
    jax.jit,
    static_argnames=("k_out", "any_wood_is_one", "cap_f", "cap_c"),
    donate_argnums=(0,),
)
def _fused_pair_knn(acc, all_q, flat_probs, base, q_off, qlens,
                    off_f, len_f, off_c, len_c, is_wood, any_wood,
                    k_out, any_wood_is_one, cap_f, cap_c):
    """kNN against a (fine, coarse) tile pair AND the median/vote fusion
    in one dispatch, reading everything from DEVICE-RESIDENT arrays:
    tile points/probabilities from the flat layout (written on device by
    FlatSink during the model phase, or uploaded once by the fallback),
    queries from per-entry slices of ``all_q`` = [flat tile xyz | uploaded
    extras]: entry i reads PAIR_QCHUNK query rows at ``q_off[i]`` — for
    most queries that offset points INTO the flat tile region (the query
    IS a classified tile point, so its coordinates never leave the
    device); only rows the tiling dropped (subsampled-out, min_pts) ride
    the uploaded extras tail. The dispatch uploads only 6 int32 per entry
    and reads back NOTHING — results accumulate into the donated ``acc``
    buffer at slots [base + i*QCHUNK, base + (i+1)*QCHUNK) (one uint16 per
    slot: bit 11 = label, bits 0-10 = pwood on the 1/2046 grid), read back
    once after all dispatches.

    ONE kNN over the fine+coarse UNION (each physical point appears once
    per scale, with that scale's probability) selects the k_out nearest
    duplicated candidates — exactly the reference's global search
    semantics (predicter.py:136-137) restricted to the pair's points, for
    BOTH k settings, with no cross-scale merge stage. Invalid slots
    (padded queries, padded tile-region rows) are excluded from the
    median and the vote.

    cap_f/cap_c are the pair's static flat-region sizes (the tiles'
    batcher buckets): one compile per (cap_f, cap_c) combo, and small
    pairs never pay a global max_pts-sized kNN.
    """
    packed = _pair_group(all_q, flat_probs, q_off, qlens, off_f, len_f,
                         off_c, len_c, is_wood, any_wood, k_out,
                         any_wood_is_one, cap_f, cap_c)
    return jax.lax.dynamic_update_slice(acc, packed, (base,))


def _pair_group(all_q, flat_probs, q_off, qlens, off_f, len_f, off_c,
                len_c, is_wood, any_wood, k_out, any_wood_is_one, cap_f,
                cap_c):
    """(len(q_off) * PAIR_QCHUNK,) packed uint16 [(label << 11) |
    round(pwood * 2046)] results for one
    dispatch stack of entries (shared by the single-device
    accumulating dispatch and the multi-device shard_map path). The
    stack height is free (the vmap takes it from q_off's shape)."""
    iota_f = jnp.arange(cap_f, dtype=jnp.int32)
    iota_c = jnp.arange(cap_c, dtype=jnp.int32)
    iota_q = jnp.arange(PAIR_QCHUNK, dtype=jnp.int32)

    from pointstowood_tpu.ops import pallas_knn

    n_union = cap_f + cap_c
    g_pay = pallas_knn.supported(n_union, k_out)

    def per(qo, ql, of, lf, oc, lc):
        qq = jax.lax.dynamic_slice(all_q, (qo, 0), (PAIR_QCHUNK, 3))
        qv = iota_q < ql
        s = jnp.concatenate([
            jax.lax.dynamic_slice(all_q, (of, 0), (cap_f, 3)),
            jax.lax.dynamic_slice(all_q, (oc, 0), (cap_c, 3)),
        ])
        pu = jnp.concatenate([
            jax.lax.dynamic_slice(flat_probs, (of,), (cap_f,)),
            jax.lax.dynamic_slice(flat_probs, (oc,), (cap_c,)),
        ])
        sm = jnp.concatenate([iota_f < lf, iota_c < lc])
        if g_pay:
            # payload-packed selection: the winning source's quantized
            # probability rides the distance value's low mantissa bits —
            # no index, no (Q, k) probability gather (which measured as
            # expensive as the kNN itself, scripts/fusion_pair_probe.py).
            # Quantization: 10 bits -> |d pwood| <= 5e-4, far inside the
            # median/vote's tile-border tolerance.
            pmax = jnp.float32((1 << pallas_knn.PAYLOAD_BITS) - 1)
            pay = jnp.round(
                jnp.clip(pu, 0.0, 1.0) * pmax
            ).astype(jnp.uint32)
            pen = jnp.sum(s * s, axis=1) + jnp.where(sm, 0.0, jnp.inf)
            gmin = pallas_knn.group_min_payload(qq, s, pen, pay, g_pay)
            vals, _ = jax.lax.approx_min_k(
                gmin, k_out, recall_target=FUSION_RECALL
            )
            vm = (vals < 1e38) & qv[:, None]
            p = pallas_knn.unpack_payload(vals).astype(jnp.float32) / pmax
        else:
            i, _, vm = knn_masked(
                qq, s, k=k_out, query_mask=qv, source_mask=sm,
                method="fast", recall_target=FUSION_RECALL,
                with_dist=False,
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

    label, pwood = jax.vmap(per)(q_off, qlens, off_f, len_f, off_c, len_c)
    # pack both outputs into one uint16 (bit 11 = label, bits 0-10 = pwood
    # on a 1/2046 grid): a quarter of the f32-pair readback bytes on a
    # slow tunneled link. Lossless on the payload path — candidate
    # probabilities are 10-bit quantized there, so the two-rank median
    # lands exactly on the 1/2046 grid; the host-upload fallback path
    # rounds by at most 2.4e-4 (inside the payload quantization's 5e-4)
    u = jnp.round(jnp.clip(pwood, 0.0, 1.0) * 2046.0).astype(jnp.uint16)
    u = u | (label.astype(jnp.uint16) << 11)
    return u.reshape(q_off.shape[0] * PAIR_QCHUNK)


_SHARDED_CACHE = {}
# (signature, combo[, stack height]) pairs already warm-executed in this
# process — their executables sit in the jit dispatch cache, so repeat
# plots skip the dummy warm dispatches
_WARMED = set()


def _sharded_pair_fn(mesh, is_wood, any_wood, k_out, any_wood_is_one,
                     cap_f, cap_c):
    """Jitted shard_map that spreads an (n_dev, rows) stack of fusion
    entries across the mesh's data axis — every chip fuses its own
    slice of the plot's tile pairs (pure DP, no collectives; the plot's
    pairs are embarrassingly parallel, SURVEY §2d). Cached per
    (mesh, thresholds, statics); jit re-specializes per stack shape."""
    key = (mesh, float(is_wood), float(any_wood), k_out, any_wood_is_one,
           cap_f, cap_c)
    fn = _SHARDED_CACHE.get(key)
    if fn is not None:
        return fn
    from jax.sharding import NamedSharding, PartitionSpec as P

    shmap = getattr(jax, "shard_map", None)
    if shmap is None:  # older jax
        from jax.experimental.shard_map import shard_map as shmap

    iw = jnp.float32(is_wood)
    aw = jnp.float32(any_wood)

    def per_shard(all_q, flat_probs, qoffs, qlens, offf, lenf, offc, lenc):
        return jax.vmap(
            lambda a, b, c, d, e, f: _pair_group(
                all_q, flat_probs, a, b, c, d, e, f, iw, aw, k_out,
                any_wood_is_one, cap_f, cap_c,
            )
        )(qoffs, qlens, offf, lenf, offc, lenc)

    d_spec = P("data")
    fn = jax.jit(shmap(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), d_spec, d_spec, d_spec, d_spec, d_spec, d_spec),
        out_specs=d_spec,
        # the pallas kernel's out_shape carries no varying-mesh-axes
        # annotation; the shards are independent (pure DP), so the check
        # adds nothing here
        check_vma=False,
    ))
    _SHARDED_CACHE[key] = fn
    return fn


class FlatLayout:
    """The device flat-array layout: tile t owns rows
    [off[t], off[t] + cap[t]) with len[t] valid. Derived either from the
    batcher's batch plan (FlatSink path — includes trailing empty-tile
    padding so whole batches write contiguously) or tightly from the tile
    order (host-upload fallback)."""

    __slots__ = ("off", "cap", "lens", "flat_len", "mp", "batch_base")

    def __init__(self, off, cap, lens, flat_len, batch_base=None):
        self.off = off          # (n_tiles,) int64 flat row offset
        self.cap = cap          # (n_tiles,) int64 padded region size
        self.lens = lens        # (n_tiles,) int64 valid rows
        self.flat_len = flat_len
        self.mp = _next_cap(flat_len)  # power-of-two device array rows
        self.batch_base = batch_base  # per-batch flat offset (sink only)


def layout_from_batches(tiles, batch_plan, batch_size) -> FlatLayout:
    """FlatLayout matching TileBatcher.batch_plan(): batch b occupies
    B_b * cap_b consecutive rows starting at batch_base[b].

    ``batch_size``: an int (uniform batch dim) or a callable
    ``cap -> B`` (the batcher's per-bucket scaled batch dim)."""
    b_for = batch_size if callable(batch_size) else (lambda _c: batch_size)
    n = len(tiles)
    off = np.zeros(n, np.int64)
    cap = np.zeros(n, np.int64)
    lens = np.array([len(t) for t in tiles], np.int64)
    batch_base = []
    goff = 0
    for bcap, ids in batch_plan:
        batch_base.append(goff)
        for j, t in enumerate(ids):
            off[t] = goff + j * bcap
            cap[t] = bcap
        goff += b_for(bcap) * bcap
    return FlatLayout(off, cap, lens, goff, batch_base)


def layout_tight(tiles, order) -> FlatLayout:
    """Fallback layout: per-tile power-of-two regions, batcher order."""
    n = len(tiles)
    off = np.zeros(n, np.int64)
    cap = np.zeros(n, np.int64)
    lens = np.array([len(t) for t in tiles], np.int64)
    goff = 0
    for t in order:
        off[t] = goff
        cap[t] = _next_cap(len(tiles[t]))
        goff += cap[t]
    return FlatLayout(off, cap, lens, goff)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _sink_write(fxyz, fprobs, pos, shift, probs, goff):
    b, n, _ = pos.shape
    xyz = (pos.astype(jnp.float32) + shift[:, None, :]).reshape(b * n, 3)
    fxyz = jax.lax.dynamic_update_slice(fxyz, xyz, (goff, 0))
    fprobs = jax.lax.dynamic_update_slice(
        fprobs, probs.astype(jnp.float32).reshape(b * n), (goff,)
    )
    return fxyz, fprobs


class FlatSink:
    """Accumulates the fusion flat arrays ON DEVICE during the model
    phase: each batch's already-uploaded positions and freshly computed
    probabilities are written (donated buffers, one dynamic_update_slice
    pair per batch) into the flat layout — the tile points are never
    re-uploaded for fusion and the probabilities are never read back.
    Batches must arrive in batch_plan order (run_inference's bucketed
    iteration order)."""

    def __init__(self, layout: FlatLayout):
        assert layout.batch_base is not None
        self.layout = layout
        self._xyz = jnp.zeros((layout.mp, 3), jnp.float32)
        self._probs = jnp.zeros(layout.mp, jnp.float32)
        self._next = 0

    def write(self, pos_dev, shift: np.ndarray, probs_dev) -> None:
        goff = self.layout.batch_base[self._next]
        self._next += 1
        self._xyz, self._probs = _sink_write(
            self._xyz, self._probs, pos_dev,
            jnp.asarray(shift.astype(np.float32)), probs_dev,
            np.int32(goff),
        )

    def arrays(self):
        assert self._next == len(self.layout.batch_base), \
            "FlatSink did not receive every batch"
        return self._xyz, self._probs


class FusionPlan:
    """Host-side dispatch plan for fuse_on_device. Everything here is
    known BEFORE the model phase produces a probability (tiles, batcher
    order and the query cloud fix every shape), so the predict engine
    builds the plan AND compiles the exact kernel variants concurrently
    with the model phase."""

    __slots__ = ("layout", "n_q", "n_slots", "nsp", "perm", "dispatches",
                 "combos", "n_near", "extra_perm", "ecap", "_inv", "_inv_dev")

    def __init__(self, layout, n_q, n_slots, nsp, perm, dispatches,
                 combos, n_near, extra_perm, ecap):
        self.layout = layout
        self.n_q = n_q
        self.n_slots = n_slots  # used permuted query slots
        self.nsp = nsp          # padded slots (power-of-two device arrays)
        self.perm = perm        # (n_slots,) int64 slot -> query row, -1 pad
        self._inv = None        # lazy (n_q,) query row -> slot (see below)
        self._inv_dev = None    # lazy device-resident int32 copy of _inv
        # [(cap_f, cap_c, base, q_off, qlens, off_f, len_f, off_c, len_c)]
        self.dispatches = dispatches
        self.combos = combos    # sorted {(cap_f, cap_c)} present
        self.n_near = n_near    # (query, scale) rows on nearest-tile fill
        # query rows whose coordinates must UPLOAD (everything else reads
        # straight from the device-resident flat tile arrays): rows the
        # tiling dropped (subsample/min_pts/legacy tiles without indices),
        # laid out in PAIR_QCHUNK-aligned extras slots (-1 = padding)
        self.extra_perm = extra_perm
        self.ecap = ecap        # padded extras rows appended after flat

    def query_slots(self) -> np.ndarray:
        """(n_q,) int64: for each query row, the result slot holding its
        fused value (``n_slots`` — one past the end — for rows no dispatch
        covers, e.g. non-finite coordinates; callers pad the result buffer
        with one zero slot). The inverse of ``perm``, built once per plan:
        turning the post-readback unpermute from a ~n_slots random scatter
        into a gather measured ~10x cheaper on the 1-core host (0.61 s at
        1M queries), and hoisting the inversion to plan time, which runs
        concurrently with the model phase and is memoized across passes.
        Duplicate slots for one query (with-replacement subsampling) hold
        identical fused values; the later slot wins, matching the scatter
        semantics this replaces."""
        if self._inv is None:
            inv = np.full(self.n_q, self.n_slots, np.int64)
            vm = self.perm >= 0
            inv[self.perm[vm]] = np.flatnonzero(vm)
            self._inv = inv
        return self._inv

    def query_slots_dev(self):
        """Device-resident int32 inverse permutation (see query_slots),
        uploaded once per plan — at plan-build time, concurrently with the
        model phase — so the post-model unpermute is a device gather and
        the single readback returns already query-ordered (VERDICT r4
        item 5: the host-side 0.15 s gather at 1M queries leaves the warm
        path). int32 is safe: n_slots is bounded by padded query rows."""
        if self._inv_dev is None or self._inv_dev.is_deleted():
            self._inv_dev = jnp.asarray(self.query_slots().astype(np.int32))
        return self._inv_dev


_PLAN_CACHE: "dict[tuple, FusionPlan]" = {}
_PLAN_CACHE_MAX = 2  # plans hold ~n_q int64 perms (~16 MB at 1M queries)


def _plan_signature(tiles, order, query_xyz, min_pts, max_pts,
                    cluster_features, layout):
    """Cheap content fingerprint of everything plan_fusion reads. Repeat
    runs of the same plot (bench warm passes, multi-pass services, repeat
    CLI invocations in one process) skip the ~0.3 s replan entirely
    (VERDICT r3 item 10). blake2b over subsampled query rows (<= 64k) +
    full tile metadata; a hash collision additionally requires identical
    tile cell ids/lengths/order and query count, so a false hit is
    practically impossible."""
    import hashlib

    n_q = query_xyz.shape[0]
    h = hashlib.blake2b(digest_size=16)
    step = max(1, n_q // 65536)
    h.update(np.ascontiguousarray(query_xyz[::step]).tobytes())
    h.update(np.asarray([t.cell_id for t in tiles], np.int64).tobytes())
    h.update(np.asarray([len(t) for t in tiles], np.int64).tobytes())
    h.update(np.asarray([t.grid_size for t in tiles], np.float64).tobytes())
    h.update(np.asarray(order, np.int64).tobytes())
    # residency depends on Tile.indices; None-ness is the cheap invariant
    # (the indices themselves are deterministic given the same tiling)
    h.update(bytes(t.indices is not None for t in tiles))
    if layout is not None:
        h.update(np.asarray(layout.off, np.int64).tobytes())
        h.update(np.asarray(layout.lens, np.int64).tobytes())
        h.update(np.int64(layout.mp).tobytes())
    # the active cap set shapes every dispatch: a plan built under one
    # regime must never be served under another (A/B runs, tests)
    return (n_q, len(tiles), int(min_pts), int(max_pts),
            bool(cluster_features), layout is None, fusion_caps(),
            h.hexdigest())


def plan_fusion(
    tiles: Sequence[Tile],
    order: Sequence[int],
    query_xyz: np.ndarray,
    min_pts: int,
    max_pts: int,
    cluster_features: bool = False,
    layout: FlatLayout | None = None,
):
    """Build the FusionPlan (pure host work: cell lookups, pair grouping,
    query permutation). Returns None when the device path does not apply
    (callers then use fusion_indices / the host search). ``cluster_features``
    tilings are declined: their cell ids are packed from the full feature
    tensor and are incomparable with the xyz-only ids recomputed here.

    ``layout``: the flat-array layout — pass the FlatSink's batch-derived
    layout for the zero-upload path; defaults to the tight fallback layout
    (host-upload path).

    Plans are memoized on a content fingerprint of (tiles, order, queries,
    layout): repeat runs of the same plot reuse the plan instead of
    re-deriving it (the plan is read-only downstream)."""
    scales = sorted({t.grid_size for t in tiles})
    if (len(scales) != 2 or min_pts < K_PER_SCALE or cluster_features
            or any(t.cell_id < 0 for t in tiles)):
        return None
    sig = _plan_signature(tiles, order, query_xyz, min_pts, max_pts,
                          cluster_features, layout)
    cached = _PLAN_CACHE.get(sig)
    if cached is not None:
        return cached
    if layout is None:
        layout = layout_tight(tiles, order)
    max_cap = int(np.max(layout.cap)) if len(layout.cap) else 0
    if max_cap > fusion_caps()[-1]:
        raise ValueError(
            f"fusion caps {fusion_caps()} do not cover the batcher's largest "
            f"tile capacity {max_cap}; the pair kernel would scan only "
            f"{fusion_caps()[-1]} of {max_cap} source rows (silently wrong "
            f"fusion). Extend TSP_FUSION_CAPS.")

    n_q = query_xyz.shape[0]
    xyz32 = query_xyz.astype(np.float32)

    # per-query tile at each scale; rows whose cell has no tile at a scale
    # (dropped by min_pts) take the nearest tile OF THAT SCALE by centroid
    # — their true nearest classified points are in an adjacent cell, and
    # the pair kernel's exact distances rank those candidates correctly.
    # Non-finite query rows are excluded from planning ENTIRELY (they fuse
    # to inert zeros): their coordinates must not perturb the Morton
    # chunking or the candidate boxes of valid queries.
    all_ids = cell_ids_multi(xyz32, scales)
    finite = all_ids[:, 0] != NAN_CELL
    tile_of = np.full((n_q, 2), -1, np.int64)
    n_near = 0
    for si, scale in enumerate(scales):
        scale_tiles = [
            t for t in range(len(tiles)) if tiles[t].grid_size == scale
        ]
        by_cell = {tiles[t].cell_id: t for t in scale_tiles}
        ids = all_ids[:, si]
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

    # group queries by (fine, coarse) pair, chunk into QCHUNK entries,
    # bucket entries by the pair's static flat-region sizes. Rows that ARE
    # rows of the pair's fine tile need no coordinate upload at all: the
    # tile's flat region holds them in tile-row order, so whole-tile-chunk
    # entries read queries straight from the flat array (resident_qoff);
    # only the remainder (subsampled-out / min_pts-dropped / legacy tiles
    # without indices) rides the uploaded extras tail.
    keys = tile_of[:, 0] * (len(tiles) + 1) + tile_of[:, 1]
    qorder = np.argsort(keys, kind="stable")
    bounds = np.flatnonzero(np.diff(keys[qorder])) + 1
    mark = np.zeros(n_q, bool)
    # (cap_f, cap_c) -> [(qs, resident_qoff | -1, off_f, len_f, off_c, len_c)]
    by_combo = {}
    for grp in np.split(qorder, bounds):
        if grp.size == 0 or tile_of[grp[0], 0] < 0:
            continue  # non-finite rows: no plan entry, fuse to inert zeros
        tf, tc = int(tile_of[grp[0], 0]), int(tile_of[grp[0], 1])
        combo = (_fusion_cap(int(layout.cap[tf])),
                 _fusion_cap(int(layout.cap[tc])))
        meta = (int(layout.off[tf]), int(layout.lens[tf]),
                int(layout.off[tc]), int(layout.lens[tc]))
        lst = by_combo.setdefault(combo, [])
        ti = tiles[tf].indices
        # residency needs every tile row mapped to THIS group (grids that
        # don't nest, or a nearest-tile fill, break that — then the whole
        # group uploads); duplicated rows (with-replacement subsampling)
        # fuse to the same value twice, which the unpermute tolerates
        resident = (
            ti is not None and ti.size == int(layout.lens[tf])
            and ti.size > 0
            and bool((ti >= 0).all()) and bool((ti < n_q).all())
            and bool((tile_of[ti, 0] == tf).all())
            and bool((tile_of[ti, 1] == tc).all())
        )
        # residency can pad up to one extra PAIR_QCHUNK entry per group
        # (the leftover rows), but an extra entry costs only ~4 KB of
        # readback + trivial kNN compute while uploading the group costs
        # 12 B/row — resident always wins on bytes moved
        rest = grp
        if resident:
            mark[ti] = True
            rest = grp[~mark[grp]]
            mark[ti] = False
            for s0 in range(0, ti.size, PAIR_QCHUNK):
                lst.append((ti[s0 : s0 + PAIR_QCHUNK],
                            int(layout.off[tf]) + s0) + meta)
        for s0 in range(0, rest.size, PAIR_QCHUNK):
            lst.append((rest[s0 : s0 + PAIR_QCHUNK], -1) + meta)

    # assemble dispatches: ONE stacked dispatch per combo chunk — entry i
    # of dispatch d owns result slots [base_d + i*QCHUNK,
    # base_d + (i+1)*QCHUNK) and reads its queries at q_off (flat region
    # for resident entries, extras tail otherwise), so dispatch payloads
    # are 6 int32 per entry and the accumulated results read back in one
    # contiguous buffer. Stack heights are padded to powers of two (<= 2
    # chunks per combo) so executables persist across plots of any size:
    # per-dispatch relay round trips, not device compute, dominated the
    # old fixed-16-entry grouping (92 dispatches / 2.1 s wall vs 0.3 s of
    # device time at the 1M-pt canonical plot).
    #
    # A padded tail writes (h - n_real) * QCHUNK garbage slots PAST the
    # dispatch's real range; because bases are consecutive and the
    # donated-acc chain executes in issue order, every later dispatch
    # rewrites its own real range, so spilled garbage only survives past
    # n_slots — nsp covers the maximum padded write end and the readback
    # slices to n_slots.
    dispatches = []
    perm_parts = []
    extra_parts = []
    base = 0
    n_extra = 0
    mp = layout.mp
    max_end = 0
    for combo in sorted(by_combo):
        entries = by_combo[combo]
        e0 = 0
        for h, n_real in _stack_chunks(len(entries)):
            batch = entries[e0 : e0 + n_real]
            e0 += n_real
            qlens = np.zeros(h, np.int32)
            qoffs = np.zeros(h, np.int32)
            offf = np.zeros(h, np.int32)
            lenf = np.zeros(h, np.int32)
            offc = np.zeros(h, np.int32)
            lenc = np.zeros(h, np.int32)
            for bi, (qs, ro, of, lf, oc, lc) in enumerate(batch):
                qlens[bi] = qs.size
                offf[bi], lenf[bi] = of, lf
                offc[bi], lenc[bi] = oc, lc
                slot = np.full(PAIR_QCHUNK, -1, np.int64)
                slot[: qs.size] = qs
                perm_parts.append(slot)
                if qs.size == 0:
                    qoffs[bi] = 0  # fully masked; any in-bounds offset
                elif ro >= 0:
                    qoffs[bi] = ro
                else:
                    qoffs[bi] = mp + n_extra * PAIR_QCHUNK
                    n_extra += 1
                    extra_parts.append(slot)
            dispatches.append(
                (combo[0], combo[1], base, qoffs, qlens, offf, lenf, offc,
                 lenc, n_real)
            )
            max_end = max(max_end, base + h * PAIR_QCHUNK)
            base += n_real * PAIR_QCHUNK

    perm = (np.concatenate(perm_parts) if perm_parts
            else np.zeros(0, np.int64))
    extra_perm = (np.concatenate(extra_parts) if extra_parts
                  else np.zeros(0, np.int64))
    # the extras tail is at least fusion_caps()[-1] rows so a rounded-cap
    # source slice (or a resident query slice) at the very end of the
    # flat array (off < mp) can never go out of bounds or clamp
    ecap = max(_next_cap(max(extra_perm.size, 1)), PAIR_QCHUNK,
               fusion_caps()[-1])
    plan = FusionPlan(
        layout, n_q, base, max(_next_cap(max(base, max_end)), 2048), perm,
        dispatches, sorted(by_combo), n_near, extra_perm, ecap,
    )
    plan.query_slots()      # build the inverse here, off the post-model path
    plan.query_slots_dev()  # and ship it to the device off that path too
    while len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[sig] = plan
    return plan


def warm_fuse_on_device(plan: FusionPlan, is_wood: float,
                        any_wood: float, mesh=None) -> None:
    """Pre-compile every fused-pair kernel variant the plan will use
    ((cap_f, cap_c) combos at the plan's resident shapes — and, under a
    multi-device mesh, the sharded stack shapes). The predict engine calls
    this concurrently with the model phase so no compile lands on the
    post-model critical path."""
    import concurrent.futures

    k_out = 64 if any_wood == 1 else 32
    mp = plan.layout.mp
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    # a combo warmed once in this process is already in the jit dispatch
    # cache: repeat plots (and bench warm passes) skip the dummy
    # executions entirely instead of re-running one kernel per combo
    sig = (mp, plan.ecap, plan.nsp, float(is_wood), float(any_wood),
           k_out, n_dev, None if mesh is None else mesh)

    if n_dev > 1 and plan.dispatches:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # per-device stack rows vary per dispatch: key shapes on them
        shapes = set()
        for d in plan.dispatches:
            h = d[3].size
            shapes.add((d[0], d[1], (-(-h // n_dev) * n_dev) // n_dev))
        todo = [s for s in sorted(shapes) if (sig, s) not in _WARMED]
        if not todo:
            return
        repl = NamedSharding(mesh, P())
        aq_r = jax.device_put(jnp.zeros((mp + plan.ecap, 3), jnp.float32),
                              repl)
        fp_r = jax.device_put(jnp.zeros(mp + plan.ecap, jnp.float32), repl)

        def one(shape):
            cap_f, cap_c, rows = shape
            z = np.zeros((n_dev, rows), np.int32)
            fn = _sharded_pair_fn(mesh, is_wood, any_wood, k_out,
                                  any_wood == 1, cap_f, cap_c)
            fn(aq_r, fp_r, z, z, z, z, z, z)
            _WARMED.add((sig, shape))
    else:
        shapes = sorted({(d[0], d[1], d[3].size) for d in plan.dispatches})
        todo = [s for s in shapes if (sig, s) not in _WARMED]
        if not todo:
            return
        aq = jnp.zeros((mp + plan.ecap, 3), jnp.float32)
        fp = jnp.zeros(mp + plan.ecap, jnp.float32)

        def one(shape):
            cap_f, cap_c, h = shape
            zi = np.zeros(h, np.int32)
            # acc is donated: give each warm call its own buffer
            _fused_pair_knn(
                jnp.zeros(plan.nsp, jnp.uint16), aq, fp, np.int32(0),
                zi, zi, zi, zi, zi, zi,
                jnp.float32(is_wood), jnp.float32(any_wood), k_out,
                any_wood == 1, cap_f, cap_c,
            )
            _WARMED.add((sig, shape))

    # several combo variants compile per plan; overlap them (the compile
    # service pipelines requests)
    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(one, todo))


def fuse_on_device(
    tiles: Sequence[Tile],
    order: Sequence[int],
    probs: np.ndarray | None,
    query_xyz: np.ndarray,
    is_wood: float,
    any_wood: float,
    min_pts: int,
    max_pts: int,
    verbose: bool = False,
    cluster_features: bool = False,
    plan: FusionPlan | None = None,
    resident=None,
    mesh=None,
):
    """Fully device-side fusion for the dual-scale configs: per (fine,
    coarse) tile pair, one dispatch runs the union kNN, gathers the
    candidate probabilities from the pair's own probability vectors, and
    reduces median + vote. Dispatches carry 5 int32 per entry and read
    nothing back; results accumulate on device and return in ONE packed
    readback.

    ``resident``: the FlatSink's (flat_xyz, flat_probs) device arrays —
    the zero-upload path (``probs`` may then be None). Without it, the
    flat arrays are built host-side at the plan's layout from ``probs``
    ((M,) classified wood probabilities in tight batcher order) and
    uploaded once.

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
    lay = plan.layout
    if verbose and plan.n_near:
        print(f"fusion: nearest-tile assignment for {plan.n_near} uncovered "
              f"(query, scale) rows — fused on-device, no host search")

    if resident is not None:
        flat_xyz, flat_probs = resident
        assert flat_xyz.shape[0] == lay.mp, \
            "resident arrays do not match the plan's layout"
    else:
        assert probs is not None
        fx = np.zeros((lay.mp, 3), np.float32)
        fpb = np.zeros(lay.mp, np.float32)
        toff = 0  # probs are in tight batcher order
        for t in order:
            o, l = int(lay.off[t]), int(lay.lens[t])
            fx[o : o + l] = tiles[t].points[:, :3]
            fpb[o : o + l] = probs[toff : toff + l]
            toff += l
        flat_xyz = jnp.asarray(fx)
        flat_probs = jnp.asarray(fpb)

    import time as _time

    t_pre = _time.perf_counter()
    # most queries ARE device-resident tile rows; only the extras tail
    # (rows the tiling dropped) ships, appended after the flat tile array
    eq = np.zeros((plan.ecap, 3), np.float32)
    vme = plan.extra_perm >= 0
    eq[: plan.extra_perm.size][vme] = (
        query_xyz[plan.extra_perm[vme]].astype(np.float32)
    )
    all_q = jnp.concatenate([flat_xyz, jnp.asarray(eq)], axis=0)
    # probabilities padded to all_q's length: rounded-cap source slices
    # may read past mp (masked by len; the pad keeps them in-bounds)
    flat_probs = jnp.concatenate(
        [flat_probs, jnp.zeros(plan.ecap, jnp.float32)]
    )
    if verbose:
        print(f"fusion: {int(vme.sum())}/{n_q} query rows uploaded "
              f"(the rest read from the resident tile arrays, "
              f"extras+concat {_time.perf_counter() - t_pre:.2f}s)")

    t_disp = _time.perf_counter()
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    pv = None  # query-ordered packed values (set on-device when possible)
    if n_dev > 1 and plan.dispatches:
        # multi-chip: stack each combo's dispatches and shard_map them
        # over the data axis — every chip fuses its own slice of the
        # plot's tile pairs (pure DP; pairs never exchange anything)
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        all_q_r = jax.device_put(all_q, repl)
        fp_r = jax.device_put(flat_probs, repl)
        packed = np.zeros(plan.n_slots, np.uint16)
        t_launched = _time.perf_counter()
        # each dispatch IS a per-combo stack: split its rows across the
        # data axis (pure DP — entries are independent), launch every
        # dispatch async, then drain
        outs = []
        for d in plan.dispatches:
            cap_f, cap_c = d[0], d[1]
            h = d[3].size
            hp = -(-h // n_dev) * n_dev
            cols = []
            for i in range(3, 9):
                c = d[i]
                if hp != h:
                    c = np.concatenate([c, np.zeros(hp - h, np.int32)])
                cols.append(np.ascontiguousarray(
                    c.reshape(n_dev, hp // n_dev)
                ))
            fn = _sharded_pair_fn(mesh, is_wood, any_wood, k_out,
                                  any_wood == 1, cap_f, cap_c)
            outs.append((d, fn(all_q_r, fp_r, *cols)))
        for d, out in outs:
            flat = np.asarray(out).reshape(-1)
            nr = d[9] * PAIR_QCHUNK
            packed[d[2] : d[2] + nr] = flat[:nr]
        if verbose:
            print(f"fusion: {len(plan.dispatches)} dispatches sharded "
                  f"over {n_dev} devices in "
                  f"{_time.perf_counter() - t_launched:.2f}s")
    else:
        acc = jnp.zeros(plan.nsp, jnp.uint16)
        for (cap_f, cap_c, base, qoffs, qlens, offf, lenf, offc,
             lenc, _nr) in plan.dispatches:
            acc = _fused_pair_knn(
                acc, all_q, flat_probs, np.int32(base), qoffs, qlens,
                offf, lenf, offc, lenc, jnp.float32(is_wood),
                jnp.float32(any_wood), k_out, any_wood == 1, cap_f, cap_c,
            )
        t_launched = _time.perf_counter()
        # unpermute ON DEVICE: gather acc[:n_slots] through the resident
        # inverse permutation (VERDICT r4 item 5). The uncovered-row
        # sentinel n_slots is out of bounds of the SLICE (not of acc,
        # whose [n_slots, nsp) tail holds dispatch-padding garbage), so
        # mode='fill' zeroes exactly those rows. The single readback is
        # then already query-ordered and n_q-sized (n_slots >= n_q).
        pv = np.asarray(jnp.take(acc[: plan.n_slots],
                                 plan.query_slots_dev(),
                                 mode="fill", fill_value=0))
        if verbose:
            print(f"fusion: {len(plan.dispatches)} dispatches "
                  f"(launch {t_launched - t_disp:.2f}s, compute+unpermute+"
                  f"readback {_time.perf_counter() - t_launched:.2f}s, "
                  f"{plan.nsp} slots -> {n_q} rows)")

    if pv is None:
        t_unperm = _time.perf_counter()
        # multi-device path read back slot-ordered stacks: gather (not
        # scatter) through the plan-time inverse permutation; one zero pad
        # slot serves every uncovered query row
        packed_pad = np.zeros(plan.n_slots + 1, np.uint16)
        packed_pad[: plan.n_slots] = packed
        pv = packed_pad[plan.query_slots()]
        if verbose:
            print(f"fusion: unpermute {_time.perf_counter() - t_unperm:.2f}s")
    out = np.empty((n_q, 2), np.float64)
    out[:, 0] = pv >> 11  # uint16: bit 11 = label, bits 0-10 = pwood * 2046
    out[:, 1] = (pv & 0x7FF) * (1.0 / 2046.0)
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
