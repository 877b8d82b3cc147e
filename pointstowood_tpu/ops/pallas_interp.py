"""Fused FP-interpolation kernel: threshold-selected inverse-distance
weights contracted against source features entirely in VMEM.

TPU-native replacement for the FP decoder's ``knn_interpolate`` gather
pipeline (reference: pointstowood/src/model.py:149 — PyG k=2
inverse-distance interpolation). The round-3 train-step trace showed the
gather formulation costing ~44 ms/step at the canonical shape: the
(B, T, 2, C+3) neighbor gathers + reshapes forward, and their scatter-add
VJPs + gradient-accumulation copies backward. All of that is layout/row
traffic, while the MXU sits idle.

This module reformulates interpolation as a masked dense contraction,
never materializing gathers or scatters:

    pass 1 (selection):  the existing ``pallas_knn.top2`` kernel gives
        each target the packed selection value of its 2nd-nearest source
        — a per-row threshold.
    pass 2 (fused sum):  for each (target block, source block) tile,
        recompute the packed distance row exactly as top2 did, derive
        W = 1/d^2 where packed <= threshold else 0, and immediately
        contract W @ feats on the MXU, accumulating (T_BLOCK, C) sums
        and (T_BLOCK, 1) weight totals. Only y-sized tensors reach HBM.

    backward:            d_feat = W^T @ (d_y / den) via the transposed
        tile loop — same recomputation, no scatter. Positions carry no
        gradient (they are network inputs), so this is the entire VJP.

Selection semantics vs the gather path: identical except (a) ties at the
threshold contribute all tied sources (weight-normalized — only exact
distance ties), and (b) when top2's folded runner-up falls to the
3rd-nearest (~1/TOP2_GROUPS of rows), the threshold ADMITS the true 2nd
as well as the 3rd, pulling the result closer to exact interpolation
than the gather path's hard top-2. Weights use a 4-pass fp32-emulated
distance (adds the lo*lo product to top2's bf16x3), accurate to ~1e-7 —
the same grade as the gather path's fp32 position subtraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointstowood_tpu.ops.pallas_knn import (
    TOP2_QUERY_BLOCK,
    _SLOT2_BITS,
    top2,
    top2_supported,
)

T_BLOCK = 256
S_BLOCK = 2048


def _weight_rows(qb, st, pen, th, qn):
    """One (T_BLOCK, S_BLOCK) tile of the selection-thresholded
    inverse-square-distance weight matrix.

    Selection compares BUCKETS: top2 ranks values with their low
    _SLOT2_BITS mantissa bits overwritten by a slot id, so two pipelines
    agree exactly on the 64-ulp bucket (bits & ~63) even though their low
    bits differ. ``th`` arrives pre-cleared (see _interp_fwd_1); clearing
    d3's low bits here costs one AND per element (clearing is monotone
    for either float sign, so the float compare still ranks correctly).
    Per-element work is deliberately minimal — this tile is O(T*S) VPU
    work and dominates the kernel.

    Weights use the 4-pass fp32-emulated squared distance (bf16x3 + the
    lo*lo product + ||q||^2), ~1e-7 absolute — the same grade as the
    gather path's fp32 position subtraction. Masked sources carry
    pen=+inf: their d3 is +inf (never <= th unless th is itself the
    all-masked sentinel) and 1/inf = 0 kills any admitted slot.
    """
    ah = qb.astype(jnp.bfloat16)
    al = (qb - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = st.astype(jnp.bfloat16)
    bl = (st - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    cross3 = dot(ah, bh) + (dot(ah, bl) + dot(al, bh))
    d3 = cross3 + pen
    bits = jax.lax.bitcast_convert_type(d3, jnp.uint32)
    cleared = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFFFFFF ^ ((1 << _SLOT2_BITS) - 1)),
        jnp.float32,
    )
    sel = cleared <= th
    d2 = jnp.maximum((d3 + dot(al, bl)) + qn, 1e-16)
    return jnp.where(sel, 1.0 / d2, 0.0)


def _fwd_kernel(q_ref, st_ref, pen_ref, th_ref, qn_ref, f_ref,
                num_ref, den_ref):
    j = pl.program_id(1)
    w = _weight_rows(q_ref[:], st_ref[:], pen_ref[:], th_ref[:], qn_ref[:])
    num = jax.lax.dot_general(
        w.astype(jnp.bfloat16), f_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    den = jnp.sum(w, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        num_ref[:] = num
        den_ref[:] = den

    @pl.when(j != 0)
    def _acc():
        num_ref[:] += num
        den_ref[:] += den


def _bwd_kernel(q_ref, st_ref, pen_ref, th_ref, qn_ref, g_ref, df_ref):
    i = pl.program_id(1)  # query-block loop is the accumulation axis
    w = _weight_rows(q_ref[:], st_ref[:], pen_ref[:], th_ref[:], qn_ref[:])
    # d_feat block += W^T @ (d_y / den): contract the query axis
    contrib = jax.lax.dot_general(
        w.astype(jnp.bfloat16), g_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _init():
        df_ref[:] = contrib

    @pl.when(i != 0)
    def _acc():
        df_ref[:] += contrib


def _operands(pos, target_pos, source_mask):
    n = pos.shape[0]
    q4 = jnp.concatenate(
        [target_pos, jnp.zeros((target_pos.shape[0], 1), jnp.float32)],
        axis=1)
    st = jnp.concatenate(
        [(-2.0) * pos.T, jnp.ones((1, n), jnp.float32)], axis=0)
    pen = jnp.sum(pos * pos, axis=1) + jnp.where(
        source_mask, 0.0, jnp.inf)
    qn = jnp.sum(target_pos * target_pos, axis=1, keepdims=True)
    return q4, st, pen[None, :], qn


def _interp_fwd_1(x, pos, target_pos, source_mask):
    """Single-sample fused interpolation. x (S, C) bf16/f32, pos (S, 3),
    target_pos (T, 3), source_mask (S,). Returns (y (T, C) f32-summed in
    x.dtype, den (T, 1), thresh (T, 1))."""
    t = target_pos.shape[0]
    q4, st, pen, qn = _operands(pos, target_pos, source_mask)
    vals, _ = top2(target_pos, pos, pen[0])
    # per-row threshold = the 2nd-smallest packed selection value with its
    # slot bits cleared — the 64-ulp bucket the kernel compares against
    thresh = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(vals[:, 1:2], jnp.uint32)
        & jnp.uint32(0xFFFFFFFF ^ ((1 << _SLOT2_BITS) - 1)),
        jnp.float32,
    )
    interpret = jax.devices()[0].platform == "cpu"
    c = x.shape[1]
    num, den = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t, c), jnp.float32),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
        ),
        grid=(t // T_BLOCK, pos.shape[0] // S_BLOCK),
        in_specs=[
            pl.BlockSpec((T_BLOCK, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, S_BLOCK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_BLOCK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_BLOCK, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T_BLOCK, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q4, st, pen, thresh, qn, x.astype(jnp.bfloat16))
    den = jnp.maximum(den, 1e-16)
    return (num / den).astype(x.dtype), den, thresh


def _interp_bwd_1(pos, target_pos, source_mask, den, thresh, d_y, c):
    q4, st, pen, qn = _operands(pos, target_pos, source_mask)
    gnorm = (d_y.astype(jnp.float32) / den).astype(jnp.bfloat16)
    interpret = jax.devices()[0].platform == "cpu"
    s = pos.shape[0]
    t = target_pos.shape[0]
    d_feat = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((s, c), jnp.float32),
        grid=(s // S_BLOCK, t // T_BLOCK),
        in_specs=[
            pl.BlockSpec((T_BLOCK, 4), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, S_BLOCK), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_BLOCK), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLOCK, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLOCK, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLOCK, c), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_BLOCK, c), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q4, st, pen, thresh, qn, gnorm)
    return d_feat


@jax.custom_vjp
def fp_interpolate_fast(x, pos, target_pos, source_mask):
    """Batched fused FP interpolation: x (B, S, C), pos (B, S, 3),
    target_pos (B, T, 3), source_mask (B, S) -> (B, T, C) in x.dtype.

    Gradient flows to ``x`` only (positions are network inputs)."""
    y, _, _ = jax.vmap(_interp_fwd_1, in_axes=(0, 0, 0, 0))(
        x, pos, target_pos, source_mask)
    return y


def _fp_fwd(x, pos, target_pos, source_mask):
    y, den, thresh = jax.vmap(_interp_fwd_1, in_axes=(0, 0, 0, 0))(
        x, pos, target_pos, source_mask)
    return y, (pos, target_pos, source_mask, den, thresh)


def _fp_bwd(res, d_y):
    pos, target_pos, source_mask, den, thresh = res
    d_feat = jax.vmap(
        _interp_bwd_1, in_axes=(0, 0, 0, 0, 0, 0, None)
    )(pos, target_pos, source_mask, den, thresh, d_y, d_y.shape[-1])
    return (d_feat.astype(d_y.dtype), jnp.zeros_like(pos),
            jnp.zeros_like(target_pos), None)


fp_interpolate_fast.defvjp(_fp_fwd, _fp_bwd)


def fused_supported(t: int, s: int, c: int) -> bool:
    """Shape constraints: target rows tile by T_BLOCK (and by top2's
    query block), sources tile by S_BLOCK, channels by the 128 lane
    width."""
    return (
        t % T_BLOCK == 0
        and t % TOP2_QUERY_BLOCK == 0
        and s % S_BLOCK == 0
        and c % 128 == 0
        and top2_supported(s)
    )
