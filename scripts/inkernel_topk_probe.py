#!/usr/bin/env python3
"""Probe: move the fast-kNN stage-2 selection (partially) into the Pallas
kernel (VERDICT r4 item 9).

Today's fast path: group_min kernel -> (Q, N/g) slot-packed matrix in HBM
-> lax.approx_min_k(k=32) -> member unpack. The amk is row-overhead
dominated (BASELINE.md: recall_target drives PartialReduce width l, which
drives everything), and kNN is 24.8 ms of the 68.7 ms forward.

Two candidates, both extending the group-min kernel with a SECOND fold
that keeps the TOP-2 packed values per folded column (top-2, not top-1:
the top-32 of 2048 land in 256 folded columns, and keeping two survivors
makes a loss require a 3-way collision — expected per-neighbor recall
loss ~C(32,3)/256^2/32 = 0.02%, vs ~6% for a single-survivor fold):

  A. fold2+amk: kernel emits the folded (Q, 2*256) candidate matrix
     (slice id packed into 3 more mantissa bits, 7 total = <=127 ulp
     ranking noise); amk then selects over a 4x smaller matrix.
  B. fold2+extract: the kernel itself extracts the top-32 by iterative
     min+mask over the (QB, 512) candidates and emits (Q, 32) values +
     source indices. No stage-2 op at all; only (Q, 64) reaches HBM.

Bail condition (VERDICT): if neither beats the current fast path at
matched-or-better recall, record the numbers and keep the current path.

Run on TPU: python scripts/inkernel_topk_probe.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointstowood_tpu.ops import pallas_knn
from pointstowood_tpu.ops.pallas_knn import QUERY_BLOCK, _HALVES

B, Q, N, K, G = 8, 8192, 16384, 32, 8
FOLD = 256          # folded columns (matches TOP2_GROUPS economics)
_SLICE_BITS = 3     # npg / FOLD = 2048/256 = 8 slices
_SLOT_BITS = 4
_BIG = 3.0e38


def _make_fold2_kernel(g, npg, n, extract_k):
    n_half = n // _HALVES
    blocks_per_half = g // _HALVES
    slices = npg // FOLD

    def dot_f32(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def kernel(q_ref, st_ref, pen_ref, *out_refs):
        qb = q_ref[:]
        # ---- fold 1: the group-min pipeline (bf16x3 distances), slot in
        # the low 4 bits, +inf clamped to a finite sentinel BEFORE packing
        # (inf | nonzero-slice-bits would be NaN in fold 2)
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
            d = jnp.minimum(d, _BIG)
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
        packed1 = ((bits >> _SLOT_BITS) << _SLOT_BITS) | slot
        mp = jax.lax.bitcast_convert_type(packed1, jnp.float32)

        # ---- fold 2: top-2 per FOLD-wide column slice, slice id into 3
        # more low mantissa bits (layout [dist][slot:4][slice:3])
        m1 = m2 = None
        for a in range(slices):
            sl = mp[:, a * FOLD : (a + 1) * FOLD]
            b = jax.lax.bitcast_convert_type(sl, jnp.uint32)
            s4 = b & ((1 << _SLOT_BITS) - 1)
            total = _SLOT_BITS + _SLICE_BITS
            pb = ((b >> total) << total) | (s4 << _SLICE_BITS)
            if a:
                pb = pb | a
            p = jax.lax.bitcast_convert_type(pb, jnp.float32)
            if m1 is None:
                m1 = p
                m2 = jnp.full(p.shape, _BIG, jnp.float32)
            else:
                upd = p < m1
                m2 = jnp.where(upd, m1, jnp.minimum(m2, p))
                m1 = jnp.where(upd, p, m1)
        cand = jnp.concatenate([m1, m2], axis=1)  # (QB, 2*FOLD)

        if not extract_k:
            out_refs[0][:] = cand
            return

        # ---- in-kernel top-k extraction (iota-argmin + mask, k passes)
        iota = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
        vcols = []
        icols = []
        for _ in range(extract_k):
            v = jnp.min(cand, axis=1, keepdims=True)
            j = jnp.min(jnp.where(cand <= v, iota, 2 * FOLD), axis=1,
                        keepdims=True)
            cand = jnp.where(iota == j, _BIG, cand)
            vb = jax.lax.bitcast_convert_type(v, jnp.uint32)
            a = (vb & ((1 << _SLICE_BITS) - 1)).astype(jnp.int32)
            s4 = ((vb >> _SLICE_BITS) & ((1 << _SLOT_BITS) - 1)).astype(
                jnp.int32)
            col = jax.lax.rem(j, 2 * FOLD) & (FOLD - 1)
            gidx = a * FOLD + col
            row = s4 * npg + gidx  # single-block member_index
            vcols.append(v)
            icols.append(row)
        out_refs[0][:] = jnp.concatenate(vcols, axis=1)
        out_refs[1][:] = jnp.concatenate(icols, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("extract_k",))
def fold2(q, s, penalty, extract_k=0):
    n = s.shape[0]
    npg = n // G
    q_n = q.shape[0]
    q4 = jnp.concatenate([q, jnp.zeros((q_n, 1), jnp.float32)], axis=1)
    st = jnp.concatenate([(-2.0) * s.T, jnp.ones((1, n), jnp.float32)],
                         axis=0)
    pen = penalty[None, :]
    interpret = jax.devices()[0].platform == "cpu"
    if extract_k:
        out_shape = (
            jax.ShapeDtypeStruct((q_n, extract_k), jnp.float32),
            jax.ShapeDtypeStruct((q_n, extract_k), jnp.int32),
        )
        out_specs = (
            pl.BlockSpec((QUERY_BLOCK, extract_k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QUERY_BLOCK, extract_k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        )
    else:
        out_shape = jax.ShapeDtypeStruct((q_n, 2 * FOLD), jnp.float32)
        out_specs = pl.BlockSpec((QUERY_BLOCK, 2 * FOLD), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fold2_kernel(G, npg, n, extract_k),
        out_shape=out_shape,
        grid=(q_n // QUERY_BLOCK,),
        in_specs=[
            pl.BlockSpec((QUERY_BLOCK, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(q4, st, pen)


def unpack_fold2(vals, idx512):
    """Variant A: recover source rows from amk over the folded matrix."""
    bits = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    a = (bits & ((1 << _SLICE_BITS) - 1)).astype(jnp.int32)
    s4 = ((bits >> _SLICE_BITS) & ((1 << _SLOT_BITS) - 1)).astype(jnp.int32)
    col = idx512 & (FOLD - 1)
    gidx = a * FOLD + col
    return s4 * (N // G) + gidx


@functools.partial(jax.jit, static_argnames=("recall",))
def variant_a(q, s, penalty, recall=0.9):
    cand = fold2(q, s, penalty, extract_k=0)
    vals, j = jax.lax.approx_min_k(cand, K, recall_target=recall)
    return unpack_fold2(vals, j.astype(jnp.int32)), vals


@jax.jit
def variant_b(q, s, penalty):
    vals, idx = fold2(q, s, penalty, extract_k=K)
    return idx, vals


@functools.partial(jax.jit, static_argnames=("recall",))
def baseline_fast(q, s, penalty, recall=0.9):
    gmin = pallas_knn.group_min(q, s, penalty, G)
    vals, gidx = jax.lax.approx_min_k(gmin, K, recall_target=recall)
    slot = pallas_knn.unpack_slot(vals)
    return pallas_knn.member_index(gidx, slot, N, G), vals


def tree_batch(rng):
    pts = []
    for _ in range(B):
        n_wood = N // 4
        theta = rng.uniform(0, 2 * np.pi, n_wood)
        r = rng.uniform(0, 0.15, n_wood)
        trunk = np.stack([r * np.cos(theta), r * np.sin(theta),
                          rng.uniform(0, 8.0, n_wood)], 1)
        crown = rng.normal(0, 0.7, size=(N - n_wood, 3)) + [0, 0, 6.0]
        xyz = np.concatenate([trunk, crown]).astype(np.float32)
        pts.append(xyz - xyz.mean(0))
    return np.stack(pts)


def recall_vs_exact(idx, pos):
    from scipy.spatial import cKDTree

    hits = tot = 0
    for b in range(B):
        tree = cKDTree(pos[b])
        _, true_idx = tree.query(pos[b], k=K)
        for i in range(0, Q, 37):  # subsample rows for speed
            hits += len(set(map(int, idx[b, i])) & set(map(int, true_idx[i])))
            tot += K
    return hits / tot


def timeit(fn, *args, iters=20):
    reduce = jax.jit(lambda t: t[0].sum() + t[1].sum())
    out = fn(*args)
    np.asarray(reduce(out))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(reduce(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    pos = tree_batch(rng)
    q = jnp.asarray(pos)
    pen = jnp.sum(q * q, axis=-1)

    results = {}
    vb = jax.vmap(variant_b)
    va = jax.vmap(functools.partial(variant_a, recall=0.9))
    base = jax.vmap(functools.partial(baseline_fast, recall=0.9))
    for name, fn in [("baseline_fast@0.9", base), ("fold2+amk@0.9", va),
                     ("fold2+extract", vb)]:
        ms = timeit(lambda a, b, c, f=fn: f(a, a, c), q, q, pen)
        idx, _ = fn(q, q, pen)
        rec = recall_vs_exact(np.asarray(idx), pos)
        results[name] = (ms, rec)
        print(f"{name:22s}  {ms:7.2f} ms   recall {rec:.4f}", flush=True)

    b_ms, b_rec = results["baseline_fast@0.9"]
    for name in ("fold2+amk@0.9", "fold2+extract"):
        ms, rec = results[name]
        verdict = "WIN" if ms < b_ms and rec >= b_rec - 0.002 else "LOSS"
        print(f"{name}: {verdict} ({ms - b_ms:+.2f} ms, {rec - b_rec:+.4f} "
              f"recall vs baseline)")


if __name__ == "__main__":
    main()
