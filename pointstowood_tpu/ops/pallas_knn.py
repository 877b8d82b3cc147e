"""Pallas fused distance + group-min kernel for the fast kNN path.

The TPU-native replacement for the torch-cluster kNN kernel's inner loop
(reference: pointstowood/src/model.py:117-120) at the kernel level.

Why this shape: XLA's approx_min_k (PartialReduce) costs ~3x the matrix
read floor at k=32 (measured 26 ms vs 8.6 ms on the 8x8192x16384 SA1
distance matrix, scripts/knn_select_probe.py), and every attempt to
pre-reduce the candidate set with XLA elementwise ops (where-chains,
3D-reshape reductions, packed-key minimum trees) defeated fusion and ran
2-4x slower than the unfused op. Inside one Pallas kernel the whole
pipeline stays in VMEM: squared distances come off the MXU in fp32
(better neighbor ranking than the bf16-matmul selection the unfused path
uses), a minimum tree folds the g strided column blocks, and only a
(Q, N/g) matrix of group minima ever reaches HBM — a g-times smaller
selection problem for the stage-2 top-k.

Kernel economics (measured on v5e at the SA1 shape, B=8 Q=8192 N=16384):

* Broadcast VPU multiply-accumulate distance chains + folding groups by
  read-modify-write through the output refs: 54 ms — slower than the
  unfused path. The version below issues ONE fp32 matmul per half-row on
  the otherwise-idle MXU and keeps the min-tree in SSA values over lane
  slices (two 8192-lane halves keep live tiles inside the ~16 MB VMEM
  scope): 4.6 ms.
* Emitting the winning member slot as a second (Q, N/g) int32 output cost
  32 ms of stage-3 ``take_along_axis`` (2M element gathers) plus half the
  kernel's HBM write traffic. Instead the slot is packed into the low
  3 mantissa bits of the fp32 group minimum (<= 7 ulp ranking noise, far
  below bf16's 8-bit mantissa): stage 2 selects over the packed values
  directly and the slot pops back out of the selected value's bits — no
  gather at all. +inf survives packing exactly: an all-masked group keeps
  slot 0 (inf < inf is false), and inf | 0 == inf.

Grouping: the N axis is processed in VMEM-sized blocks (N_BLOCK, a grid
dimension — one (QUERY_BLOCK, N) distance tile at N = 32k blows the 16 MB
scoped-VMEM limit) and groups are BLOCK-LOCAL: within block b, group jj
holds source indices {b * N_BLOCK + a * N_BLOCK/g + jj for a < g}
(stride N_BLOCK/g). Tile arrays are spatially cell-sorted, so
index-adjacent points are spatial neighbors; the stride puts them in
different groups and intra-group true-neighbor collisions stay near the
random ~1-3% level. ``member_index`` maps (group, slot) back to the
source row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_BLOCK = 128
_HALVES = 2
SLOT_BITS = 4  # supports g <= 16 (<= 15 ulp fp32 ranking noise, still
# far below the bf16-matmul alternative's 8-bit mantissa)
# Largest group fold `supported()` will hand out. g=16 halves the stage-2
# selection matrix vs g=8 but doubles intra-group true-neighbor collision
# odds — flip here (or monkeypatch in a probe) to A/B recall/latency.
G_MAX = 8
# Sources per grid step. 16384 is the largest measured-safe width for the
# per-step (QUERY_BLOCK, n_block) fp32 distance tiles inside the ~16 MB
# scoped-VMEM budget; larger N iterates over blocks with block-local
# grouping (needed by the fusion pair kernel, whose fine+coarse union
# reaches 32k sources).
N_BLOCK_MAX = 16384


def _n_block(n: int) -> int:
    for b in (N_BLOCK_MAX, 8192, 4096, 2048):
        if n % b == 0 and b <= n:
            return b
    return n


def _make_kernel(g: int, n_groups: int, n: int, precision):
    n_half = n // _HALVES
    blocks_per_half = g // _HALVES

    dot_prec = (
        jax.lax.Precision.DEFAULT if precision == "bf16x3" else precision
    )

    def dot_f32(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_prec,
        )

    def dot_3pass(a, b):
        # Emulated bf16x3 (Mosaic rejects Precision.HIGH): hi/lo-split both
        # operands and drop only the lo*lo term — ~2^-18 relative product
        # error, fp32-grade for neighbor ranking, at half the passes of
        # HIGHEST (fp32 contraction dim 4 pads to 128 either way, so every
        # avoided pass is pure savings).
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot_f32(ah, bh) + (dot_f32(ah, bl) + dot_f32(al, bh))

    def kernel(q_ref, st_ref, pen_ref, gmin_ref):
        # q (QB, 4) query block [x, y, z, 0]; st (4, N) sources stacked as
        # [-2x, -2y, -2z, 1]; pen (1, N) = ||s||^2 (+inf at masked
        # sources). One matmul then yields pen - 2 q.s directly, which
        # ranks like the true distance (the per-query ||q||^2 constant is
        # rank-invariant).
        qb = q_ref[:]
        m = None
        slot = None
        for h in range(_HALVES):
            lo_h = h * n_half
            sth = st_ref[:, lo_h : lo_h + n_half]
            if precision == "bf16x3":
                cross = dot_3pass(qb, sth)
            else:
                cross = dot_f32(qb, sth)
            d = cross + pen_ref[:, lo_h : lo_h + n_half]
            for a in range(blocks_per_half):
                blk = h * blocks_per_half + a
                da = d[:, a * n_groups : (a + 1) * n_groups]
                if m is None:
                    m = da
                    slot = jnp.zeros(da.shape, jnp.uint32)
                else:
                    upd = da < m
                    m = jnp.where(upd, da, m)
                    slot = jnp.where(upd, jnp.uint32(blk), slot)
        bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
        # clear the low SLOT_BITS via shifts (avoids a captured mask
        # constant, which pallas kernels may not close over)
        packed = ((bits >> SLOT_BITS) << SLOT_BITS) | slot
        gmin_ref[:] = jax.lax.bitcast_convert_type(packed, jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("g", "precision"))
def group_min(q: jax.Array, s: jax.Array, penalty: jax.Array, g: int,
              precision: str = "bf16x3"):
    """Per (query, group): min selection value with the winning member slot
    packed into its low SLOT_BITS mantissa bits.

    q: (Q, 3) fp32 queries (Q a multiple of QUERY_BLOCK).
    s: (N, 3) fp32 sources (N a multiple of g*128).
    penalty: (N,) fp32 = ||s||^2, +inf at masked sources.
    precision: MXU passes for the fp32 distance matmul — 'default' (one
      bf16 pass: cheapest, bf16-grade ranking), 'bf16x3' (emulated
      3-pass split product: ~fp32-grade ranking at half of 'highest', the
      measured sweet spot), 'highest' (fp32-exact; the contraction dim is
      only 4, padded to 128, so extra passes are pure overhead).
    Returns gmin (Q, N/g) fp32 (slot-packed; +inf where the whole group is
    masked).

    vmap-safe: the pallas batching rule prepends a grid axis with 1-sized
    blocks, so per-step VMEM stays at the unbatched footprint.
    """
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "bf16x3": "bf16x3",
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    n = s.shape[0]
    n_block = _n_block(n)
    npg = n_block // g  # groups per block (block-LOCAL grouping)
    q_n = q.shape[0]
    # Fold the -2 factor into the source operand so the kernel's matmul
    # epilogue is a single add of the penalty row.
    q4 = jnp.concatenate([q, jnp.zeros((q_n, 1), jnp.float32)], axis=1)
    st = jnp.concatenate(
        [(-2.0) * s.T, jnp.ones((1, n), jnp.float32)], axis=0
    )  # (4, N)
    pen = penalty[None, :]
    grid = (q_n // QUERY_BLOCK, n // n_block)
    # Mosaic is TPU-only; the simulated-CPU test platform runs the kernel
    # through the Pallas interpreter (same numerics).
    interpret = jax.devices()[0].platform == "cpu"
    gmin = pl.pallas_call(
        _make_kernel(g, npg, n_block, prec),
        out_shape=jax.ShapeDtypeStruct((q_n, n // g), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((QUERY_BLOCK, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QUERY_BLOCK, npg), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q4, st, pen)
    return gmin


def member_index(gidx: jax.Array, slot: jax.Array, n: int, g: int):
    """Source row for (global group index, member slot) under block-local
    grouping: block b = gidx // (n_block/g), within-block group
    jj = gidx % (n_block/g), row = b * n_block + slot * n_block/g + jj.
    Reduces to slot * (n/g) + gidx when n fits one block."""
    n_block = _n_block(n)
    npg = jnp.int32(n_block // g)
    gidx = gidx.astype(jnp.int32)
    if n_block == n:
        return slot * npg + gidx
    return (gidx // npg) * jnp.int32(n_block) + slot * npg + (gidx % npg)


_SLICE_BITS = 3    # second-fold slice id (<= 8 slices)
_TOPK_BIG = 3.0e38  # masked-source clamp (packing slice bits into +inf
# would produce NaN and poison the fold minimums)


def _topk_fold(npg: int) -> int:
    """Second-fold column width for npg first-fold groups: a lane-aligned
    divisor of npg <= 256 whose slice count fits _SLICE_BITS. 0 =
    unsupported shape.

    256-first is measured (scripts/topk_stage_gate_probe.py +
    topk_fold_recall_probe.py, v5e, B=8 vmapped, interleaved-rep
    minima). Narrower folds are a recorded NEGATIVE: fold=128 at
    npg=1024 won isolated (4.78 vs 5.85 ms at the SA2 shape) but was
    neutral-to-worse inside the full forward (SA2 kNN 6.27 vs 5.70 ms,
    forward 69.1 vs 69.2 — relay rep spread ±2 ms swallows the isolated
    win) while costing recall (0.981 vs 0.986); fold=64 at npg=512 lost
    outright (5.88 vs 4.78 ms — extra fold-2 slices cost more than the
    narrower extraction saves once the matrix is small)."""
    for fold in (256, 128):
        if npg % fold == 0 and npg // fold <= (1 << _SLICE_BITS):
            return fold
    return 0


def topk_supported(n: int, k: int) -> int:
    """Largest group count for the fused top-k kernel (0 = not usable):
    the group_min constraints plus a valid second-fold width and k within
    the fold's 2-survivor candidate set, single N block."""
    g = supported(n, k)
    if not g or n > N_BLOCK_MAX:
        return 0
    fold = _topk_fold(n // g)
    if not fold or k > 2 * fold:
        return 0
    return g


def _make_topk_kernel(g: int, npg: int, n: int, fold: int, k: int):
    """group_min + a SECOND fold keeping the top-2 packed values per
    ``fold``-wide column + in-kernel top-k extraction.

    Selecting k=32 of npg=2048 via approx_min_k is row-overhead dominated
    (BASELINE.md); folding to (QB, fold) with TWO survivors per column
    first makes a lost neighbor require a 3-way collision of the true
    top-k in one column (expected per-neighbor loss ~C(32,3)/256^2/32 ≈
    0.02%), and the k extraction passes then run on a matrix 4x smaller
    than stage 2 saw. Measured at the SA1 shape (8x8192x16384, v5e,
    scripts/inkernel_topk_probe.py): 20.25 ms / 0.9915 recall vs the
    group_min+amk@0.9 path's 23.64 ms / 0.9708 — faster AND more
    accurate, so it replaces amk wherever the shape allows. Only (Q, 2k)
    values+indices ever reach HBM.

    Packing layout (low mantissa bits): [dist][slot:4][slice:3] — 7 ulp
    ranking noise, still far below the bf16-matmul alternative."""
    n_half = n // _HALVES
    blocks_per_half = g // _HALVES
    slices = npg // fold

    def dot_f32(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def kernel(q_ref, st_ref, pen_ref, vals_ref, idx_ref):
        qb = q_ref[:]
        # fold 1: the group_min pipeline (bf16x3 distances), slot packed
        # into the low SLOT_BITS; +inf clamped finite BEFORE packing
        m = None
        slot = None
        for h in range(_HALVES):
            lo_h = h * n_half
            sth = st_ref[:, lo_h : lo_h + n_half]
            ah = qb.astype(jnp.bfloat16)
            al = (qb - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = sth.astype(jnp.bfloat16)
            bl = (sth - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = (dot_f32(ah, bh) + (dot_f32(ah, bl) + dot_f32(al, bh))
                 ) + pen_ref[:, lo_h : lo_h + n_half]
            d = jnp.minimum(d, _TOPK_BIG)
            for a in range(blocks_per_half):
                blk = h * blocks_per_half + a
                da = d[:, a * npg : (a + 1) * npg]
                if m is None:
                    m = da
                    slot = jnp.zeros(da.shape, jnp.uint32)
                else:
                    upd = da < m
                    m = jnp.where(upd, da, m)
                    slot = jnp.where(upd, jnp.uint32(blk), slot)
        bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
        packed1 = ((bits >> SLOT_BITS) << SLOT_BITS) | slot
        mp = jax.lax.bitcast_convert_type(packed1, jnp.float32)

        # fold 2: top-2 per fold-wide column, slice id into 3 more bits
        total = SLOT_BITS + _SLICE_BITS
        m1 = m2 = None
        for a in range(slices):
            sl = mp[:, a * fold : (a + 1) * fold]
            b = jax.lax.bitcast_convert_type(sl, jnp.uint32)
            s4 = b & ((1 << SLOT_BITS) - 1)
            pb = ((b >> total) << total) | (s4 << _SLICE_BITS)
            if a:
                pb = pb | a
            p = jax.lax.bitcast_convert_type(pb, jnp.float32)
            if m1 is None:
                m1 = p
                m2 = jnp.full(p.shape, _TOPK_BIG, jnp.float32)
            else:
                upd = p < m1
                m2 = jnp.where(upd, m1, jnp.minimum(m2, p))
                m1 = jnp.where(upd, p, m1)
        cand = jnp.concatenate([m1, m2], axis=1)  # (QB, 2*fold)

        # top-k extraction: k unrolled iota-argmin + mask passes over the
        # candidate matrix; unpack [slot][slice] + column -> source row
        iota = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
        vcols = []
        icols = []
        for _ in range(k):
            v = jnp.min(cand, axis=1, keepdims=True)
            j = jnp.min(jnp.where(cand <= v, iota, 2 * fold), axis=1,
                        keepdims=True)
            cand = jnp.where(iota == j, _TOPK_BIG, cand)
            vb = jax.lax.bitcast_convert_type(v, jnp.uint32)
            a = (vb & ((1 << _SLICE_BITS) - 1)).astype(jnp.int32)
            s4 = ((vb >> _SLICE_BITS) & ((1 << SLOT_BITS) - 1)).astype(
                jnp.int32)
            col = j & (fold - 1)  # j in [0, 2*fold); m2 cols alias m1's
            gidx = a * fold + col
            vcols.append(v)
            icols.append(s4 * npg + gidx)  # single-block member_index
        vals_ref[:] = jnp.concatenate(vcols, axis=1)
        idx_ref[:] = jnp.concatenate(icols, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("g", "k", "fold"))
def group_min_topk(q: jax.Array, s: jax.Array, penalty: jax.Array,
                   g: int, k: int, fold: int | None = None):
    """Fused grouped top-k: the group_min pipeline plus a two-survivor
    second fold and in-kernel extraction — no stage-2 selection op.

    q: (Q, 3) fp32 (Q a multiple of QUERY_BLOCK); s: (N, 3) fp32 with
    ``topk_supported(N, k) == g``; penalty: (N,) = ||s||^2, +inf at
    masked rows. ``fold`` overrides the second-fold column width (must
    divide N/g with <= 2**_SLICE_BITS slices and k <= 2*fold; default
    ``_topk_fold``). Returns vals (Q, k) fp32 selection values (pen -
    2 q.s, slot/slice-packed, clamped near fp32-max where masked —
    filter with ``vals > 1e38``), idx (Q, k) int32 source rows."""
    n = s.shape[0]
    npg = n // g
    if fold is None:
        fold = _topk_fold(npg)
    assert fold and npg % fold == 0 and npg // fold <= (1 << _SLICE_BITS) \
        and k <= 2 * fold, (n, g, k, fold)
    q_n = q.shape[0]
    q4 = jnp.concatenate([q, jnp.zeros((q_n, 1), jnp.float32)], axis=1)
    st = jnp.concatenate(
        [(-2.0) * s.T, jnp.ones((1, n), jnp.float32)], axis=0
    )
    pen = penalty[None, :]
    interpret = jax.devices()[0].platform == "cpu"
    vals, idx = pl.pallas_call(
        _make_topk_kernel(g, npg, n, fold, k),
        out_shape=(
            jax.ShapeDtypeStruct((q_n, k), jnp.float32),
            jax.ShapeDtypeStruct((q_n, k), jnp.int32),
        ),
        grid=(q_n // QUERY_BLOCK,),
        in_specs=[
            pl.BlockSpec((QUERY_BLOCK, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((QUERY_BLOCK, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QUERY_BLOCK, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q4, st, pen)
    return vals, idx


PAYLOAD_BITS = 10  # quantized-probability payload (fusion pair kernel)
_PAYLOAD_BIG = 3.0e38  # masked-source clamp (inf | payload would be NaN)


def _make_payload_kernel(g: int, n_groups: int, n: int):
    n_half = n // _HALVES
    blocks_per_half = g // _HALVES

    def dot_f32(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def kernel(q_ref, st_ref, pen_ref, pay_ref, gmin_ref):
        # Same distance pipeline as the group-min kernel (bf16x3 split
        # product), but the min-tree carries each source column's PAYLOAD
        # (a PAYLOAD_BITS uint, e.g. a quantized fusion probability)
        # instead of the member slot, and the fold compares RAW distances
        # (payload packing adds zero ranking noise inside the kernel;
        # only the stage-2 top-k sees the <= 2^PAYLOAD_BITS-ulp packed
        # values). The selected value IS the answer — downstream never
        # needs a gather, which measured as expensive as the whole kNN
        # (scripts/fusion_pair_probe.py: the (Q, 64) probability element
        # gather costs ~10.7 ms of a 25 ms fusion dispatch).
        qb = q_ref[:]
        big = 3.0e38
        m = None
        pay = None
        for h in range(_HALVES):
            lo_h = h * n_half
            sth = st_ref[:, lo_h : lo_h + n_half]
            ah = qb.astype(jnp.bfloat16)
            al = (qb - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = sth.astype(jnp.bfloat16)
            bl = (sth - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = (dot_f32(ah, bh) + (dot_f32(ah, bl) + dot_f32(al, bh))
                 ) + pen_ref[:, lo_h : lo_h + n_half]
            d = jnp.minimum(d, big)  # masked +inf -> finite sentinel
            for a in range(blocks_per_half):
                da = d[:, a * n_groups : (a + 1) * n_groups]
                # (1, n_groups) column payloads of this member block
                pa = pay_ref[
                    :, lo_h + a * n_groups : lo_h + (a + 1) * n_groups
                ]
                if m is None:
                    m = da
                    pay = jnp.broadcast_to(pa, da.shape)
                else:
                    upd = da < m
                    m = jnp.where(upd, da, m)
                    pay = jnp.where(upd, pa, pay)
        bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
        packed = ((bits >> PAYLOAD_BITS) << PAYLOAD_BITS) | pay
        gmin_ref[:] = jax.lax.bitcast_convert_type(packed, jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("g",))
def group_min_payload(q: jax.Array, s: jax.Array, penalty: jax.Array,
                      payload: jax.Array, g: int):
    """Per (query, group): min selection value with the winning source's
    PAYLOAD packed into its low PAYLOAD_BITS mantissa bits.

    q: (Q, 3) fp32 (Q a multiple of QUERY_BLOCK); s: (N, 3) fp32;
    penalty: (N,) = ||s||^2, +inf at masked rows; payload: (N,) uint32
    < 2^PAYLOAD_BITS. Returns gmin (Q, N/g) fp32: values rank like the
    true distances to <= 2^PAYLOAD_BITS ulp (relative ~2^-13 — noise only
    among near-exact distance ties); masked-only groups come back clamped
    near fp32-max (> 1e38), NOT +inf. Select with approx_min_k, then
    ``unpack_payload`` — no index, no gather."""
    n = s.shape[0]
    n_block = _n_block(n)
    npg = n_block // g
    q_n = q.shape[0]
    q4 = jnp.concatenate([q, jnp.zeros((q_n, 1), jnp.float32)], axis=1)
    st = jnp.concatenate(
        [(-2.0) * s.T, jnp.ones((1, n), jnp.float32)], axis=0
    )
    pen = penalty[None, :]
    payr = payload.astype(jnp.uint32)[None, :]
    grid = (q_n // QUERY_BLOCK, n // n_block)
    interpret = jax.devices()[0].platform == "cpu"
    gmin = pl.pallas_call(
        _make_payload_kernel(g, npg, n_block),
        out_shape=jax.ShapeDtypeStruct((q_n, n // g), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((QUERY_BLOCK, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QUERY_BLOCK, npg), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q4, st, pen, payr)
    return gmin


def unpack_payload(vals: jax.Array) -> jax.Array:
    """Recover the payload from packed selection values."""
    bits = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    return (bits & jnp.uint32((1 << PAYLOAD_BITS) - 1)).astype(jnp.int32)


TOP2_GROUPS = 256
TOP2_QUERY_BLOCK = 256  # larger blocks amortize per-grid-step overhead;
# 512 blew the 16 MB scoped-VMEM limit (the bf16x3 partial products keep
# ~2 live (QB, n/2) fp32 tiles next to the folded matrix)
_SLOT2_BITS = 6  # supports n up to 64 * TOP2_GROUPS


def _make_top2_kernel(n: int):
    n_half = n // _HALVES
    g = n // TOP2_GROUPS
    slices_per_half = g // _HALVES

    def kernel(q_ref, st_ref, pen_ref, vals_ref, idx_ref):
        # Same operands as the group-min kernel; output is the top-2 per
        # query (selection values + source indices) — no stage-2 op at all.
        # k=2 is the FP-interpolation case (reference model.py:149).
        #
        # Equality-argmin over the full row costs ~9 VPU passes (measured
        # slower than the unfused path). Instead each TOP2_GROUPS-wide
        # slice is packed (slice id into the low mantissa bits) and folded
        # with ONE jnp.minimum per slice; the top-2 reduction then runs on
        # the (QB, TOP2_GROUPS) folded matrix — 32x fewer elements. The
        # true minimum always survives the fold; the runner-up is lost only
        # when both land in the same group column (~1/TOP2_GROUPS of
        # queries pick the 3rd-nearest instead).
        qb = q_ref[:]
        big = 3.0e38  # python literals lower as inline scalars; jnp
        # scalars would be captured constants, which pallas rejects

        m = None
        for h in range(_HALVES):
            lo_h = h * n_half
            sth = st_ref[:, lo_h : lo_h + n_half]
            ah = qb.astype(jnp.bfloat16)
            al = (qb - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = sth.astype(jnp.bfloat16)
            bl = (sth - bh.astype(jnp.float32)).astype(jnp.bfloat16)

            def dot(a, b):
                return jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            d = (dot(ah, bh) + (dot(ah, bl) + dot(al, bh))
                 ) + pen_ref[:, lo_h : lo_h + n_half]
            # clamp +inf (masked sources) BEFORE packing: inf | slot is a
            # NaN payload and NaN poisons jnp.minimum
            d = jnp.minimum(d, big)
            for a in range(slices_per_half):
                slot = h * slices_per_half + a
                # shift/OR per slice (a full-width bits temp would double
                # the live VMEM next to d)
                sl = jax.lax.bitcast_convert_type(
                    d[:, a * TOP2_GROUPS : (a + 1) * TOP2_GROUPS],
                    jnp.uint32,
                )
                sl = (sl >> _SLOT2_BITS) << _SLOT2_BITS
                if slot:
                    sl = sl | slot
                p = jax.lax.bitcast_convert_type(sl, jnp.float32)
                m = p if m is None else jnp.minimum(m, p)

        # top-2 over the folded (QB, TOP2_GROUPS) matrix
        iota = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
        v1 = jnp.min(m, axis=1, keepdims=True)
        j1 = jnp.min(jnp.where(m <= v1, iota, n), axis=1, keepdims=True)
        m2 = jnp.where(iota == j1, big, m)
        v2 = jnp.min(m2, axis=1, keepdims=True)
        j2 = jnp.min(jnp.where(m2 <= v2, iota, n), axis=1, keepdims=True)

        def unpack(v, j):
            b = jax.lax.bitcast_convert_type(v, jnp.uint32)
            slot = (b & ((1 << _SLOT2_BITS) - 1)).astype(jnp.int32)
            return slot * TOP2_GROUPS + j

        vals_ref[:] = jnp.concatenate([v1, v2], axis=1)
        idx_ref[:] = jnp.concatenate([unpack(v1, j1), unpack(v2, j2)],
                                     axis=1)

    return kernel


@jax.jit
def top2(q: jax.Array, s: jax.Array, penalty: jax.Array):
    """Exact nearest-2 selection (the FP-interpolation k).

    q: (Q, 3) fp32 (Q a multiple of TOP2_QUERY_BLOCK); s: (N, 3) fp32
    (N a multiple of 2*TOP2_GROUPS, N/TOP2_GROUPS <= 64); penalty: (N,) =
    ||s||^2, +inf at masked rows. Returns vals (Q, 2) fp32 selection
    values (pen - 2 q.s, slot-packed, clamped to ~3e38 where masked),
    idx (Q, 2) int32.

    The nearest neighbor is always exact (up to bf16x3 matmul ranking);
    the runner-up falls to the 3rd-nearest for the ~1/TOP2_GROUPS of
    queries whose top-2 collide in one folded group column. Only (Q, 2)
    ever reaches HBM.
    """
    n = s.shape[0]
    q_n = q.shape[0]
    q4 = jnp.concatenate([q, jnp.zeros((q_n, 1), jnp.float32)], axis=1)
    st = jnp.concatenate(
        [(-2.0) * s.T, jnp.ones((1, n), jnp.float32)], axis=0
    )
    pen = penalty[None, :]
    interpret = jax.devices()[0].platform == "cpu"
    vals, idx = pl.pallas_call(
        _make_top2_kernel(n),
        out_shape=(
            jax.ShapeDtypeStruct((q_n, 2), jnp.float32),
            jax.ShapeDtypeStruct((q_n, 2), jnp.int32),
        ),
        grid=(q_n // TOP2_QUERY_BLOCK,),
        in_specs=[
            pl.BlockSpec((TOP2_QUERY_BLOCK, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TOP2_QUERY_BLOCK, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TOP2_QUERY_BLOCK, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q4, st, pen)
    return vals, idx


def top2_supported(n: int) -> bool:
    """Shape constraints for the folded top-2 kernel."""
    return (
        n >= 2 * TOP2_GROUPS
        and n % (2 * TOP2_GROUPS) == 0
        and n // TOP2_GROUPS <= (1 << _SLOT2_BITS)
    )


def unpack_slot(vals: jax.Array) -> jax.Array:
    """Recover the winning member slot from packed group minima."""
    bits = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    return (bits & jnp.uint32((1 << SLOT_BITS) - 1)).astype(jnp.int32)


def supported(n: int, k: int) -> int:
    """Largest valid group count for n sources (0 = kernel not usable)."""
    g = G_MAX
    while g > 1 and (n % (g * 128) or (n // g) < k):
        g //= 2
    if g <= 1 or n < 2048 or g % _HALVES:
        return 0
    return g
