"""Fixed-k PointNet set-abstraction convolution.

TPU-native reformulation of the reference's custom PointNetConv
(reference: pointstowood/src/pointnet.py:20-132). The edge-list +
scatter-max message passing becomes: gather the (B, S, k) neighborhoods,
build per-edge messages, run the local MLP over the dense (B, S, k, C)
block (pure matmuls on the MXU), and reduce with a masked max over the k
axis.

Gather strategy: on TPU the row gather is op-overhead bound (measured
~6 ns/row regardless of row width), so features and positions are fused
into ONE neighbor gather on a flattened (B*N, C+4) array — measured 1.7x
faster than take_along_axis and half the gather count. The SA1 radius
filter also happens here (instead of a separate distance recompute in the
kNN op): the fp32 relative positions needed for the message are exactly
the distances the radius test needs.

Message layout matches the reference exactly (pointnet.py:116-132):
``[x_j, (pos_j - pos_i) / (max_dist_i + 1e-8), reflectance_j]`` where
``max_dist_i`` is the per-center maximum neighbor distance (the reference's
scatter_max over edge targets).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointstowood_tpu.model.layers import RefMLP

# Gather backward: XLA's native scatter-add. Every measured alternative
# lost on real hardware (BASELINE.md): an MXU one-hot-matmul scatter
# kernel was +13 ms/step (A/B'd round 3, kernel deleted), sort-based
# segment-sum 3x slower, forward-hoisted permutation+cumsum 2.5x slower.
# The wins that stuck are structural: dead-tail VJPs and the SA1
# stem-recompute, below.


def _gather_impl(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    b, n, c = arr.shape
    flat_idx = idx.reshape(b, -1) + (
        jnp.arange(b, dtype=jnp.int32) * jnp.int32(n)
    )[:, None]
    out = arr.reshape(b * n, c)[flat_idx.reshape(-1)]
    return out.reshape(idx.shape + (c,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_rows_n(n: int, arr, idx):
    return _gather_impl(arr, idx)


def _gather_fwd(n, arr, idx):
    return _gather_impl(arr, idx), idx


def _gather_bwd(n, idx, ct):
    b = idx.shape[0]
    e = math.prod(idx.shape[1:])
    c = ct.shape[-1]
    ctf = ct.reshape(b, e, c)
    idxf = idx.reshape(b, e)
    d_arr = jnp.zeros((b, n, c), ct.dtype).at[
        jnp.arange(b, dtype=jnp.int32)[:, None], idxf
    ].add(ctf)
    return d_arr, None


_gather_rows_n.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_rows_deadtail(n: int, tail: int, arr, idx):
    return _gather_impl(arr, idx)


def _gather_deadtail_fwd(n, tail, arr, idx):
    return _gather_impl(arr, idx), idx


def _gather_deadtail_bwd(n, tail, idx, ct):
    # The tail channels are geometry whose cotangent dead-ends at network
    # inputs (positions are data, not parameters). When they ride a FUSED
    # gather, XLA cannot prune them out of the single scatter-add the VJP
    # emits — measured 26% of the SA2 scatter and 25% of SA3
    # (scripts/gather_width_probe.py). Scatter only the live head; the
    # zero tail below is a symbol XLA's slice-of-concat simplifier deletes.
    b = idx.shape[0]
    e = math.prod(idx.shape[1:])
    c = ct.shape[-1]
    ctf = ct[..., : c - tail].reshape(b, e, c - tail)
    idxf = idx.reshape(b, e)
    scat = jnp.zeros((b, n, c - tail), ct.dtype).at[
        jnp.arange(b, dtype=jnp.int32)[:, None], idxf
    ].add(ctf)
    d_arr = jnp.concatenate(
        [scat, jnp.zeros((b, n, tail), ct.dtype)], axis=-1
    )
    return d_arr, None


_gather_rows_deadtail.defvjp(_gather_deadtail_fwd, _gather_deadtail_bwd)


def gather_rows(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather via one flat global gather: arr (B, N, C),
    idx (B, ...) -> (B, ..., C). Flattening to (B*N, C) with offset indices
    is measurably faster than take_along_axis on TPU. The backward is
    XLA's native scatter-add (see the note above)."""
    return _gather_rows_n(arr.shape[1], arr, idx)


def gather_rows_deadtail(arr: jnp.ndarray, idx: jnp.ndarray,
                         tail: int) -> jnp.ndarray:
    """gather_rows for fused [features, geometry] rows whose last ``tail``
    channels carry NO live gradient (positions / reflectance are network
    inputs): the VJP scatter-adds only the feature head and returns zeros
    for the tail. Callers must guarantee the tail cotangent is genuinely
    dead — differentiating the tail through this op silently yields 0."""
    if tail <= 0:
        return _gather_rows_n(arr.shape[1], arr, idx)
    return _gather_rows_deadtail(arr.shape[1], tail, arr, idx)


# Backwards-compatible alias (older call sites / tests).
gather_points = gather_rows


class PointConv(nn.Module):
    """One set-abstraction conv over a padded batch.

    Inputs:
      x:          (B, N, C_in) source features, or None at the stem stage
      pos4:       (B, N, 4) source xyz (already divided by the per-sample
                  scale factor, as the reference does at model.py:122) +
                  reflectance (NOT scaled, matching model.py:109,122)
      center_idx: (B, S) int32 indices of sampled centers into the sources
      nbr_idx:    (B, S, k) int32 neighbor indices into the sources
      nbr_valid:  (B, S, k) bool neighbor validity
      center_valid: (B, S) bool
      radius:     optional radius cap — neighbors farther than this (in the
                  *scaled* coordinates of pos4) are masked out, reproducing
                  the reference SA1 radius search (model.py:118). Note the
                  reference searches in unscaled coordinates; the caller
                  passes radius/sf-corrected values (see SAStage).
    Output: (B, S, C_out) features, zero at invalid centers.
    """

    channels: tuple  # local_nn widths, e.g. (C+4, 2C, 4C)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos4, center_idx, nbr_idx, nbr_valid, center_valid,
                 radius=None, use_running_average: bool = False,
                 stem_edge=None, sf=None):
        x_j = None
        if x is None:
            # positions carry no live gradient; JAX prunes this gather's
            # VJP entirely (pos4 is not a differentiated input)
            gathered = gather_rows(pos4, nbr_idx)         # (B, S, k, 4)
            pos_j = gathered
        elif x.dtype == jnp.bfloat16 and x.shape[-1] >= 256:
            # Packed-bf16 fused gather for the wide stages: beyond ~1 KB
            # rows the gather is byte-limited well below HBM bandwidth
            # (scripts/gather_width_probe.py: SA3 6.5 -> 5.4 ms), so carry
            # features natively bf16 and the fp32 geometry as exact bf16
            # hi/lo channel pairs. Reconstruction error <= |pos| * 2^-17
            # in the scaled frame — inside the bf16 quantization the
            # message sees anyway. fp32 mode keeps the exact path below.
            hi = pos4.astype(jnp.bfloat16)
            lo = (pos4 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            packed = jnp.concatenate([x, hi, lo], axis=-1)
            gathered = gather_rows_deadtail(packed, nbr_idx, tail=8)
            x_j = gathered[..., :-8]                      # (B, S, k, C_in)
            pos_j = (gathered[..., -8:-4].astype(jnp.float32)
                     + gathered[..., -4:].astype(jnp.float32))
        else:
            # ONE fused gather for features + geometry. The 4 geometry
            # channels carry no live gradient, so the VJP scatters only
            # the feature head (26%/25% of the SA2/SA3 backward scatter,
            # scripts/gather_width_probe.py).
            src = jnp.concatenate([x.astype(jnp.float32), pos4], axis=-1)
            gathered = gather_rows_deadtail(src, nbr_idx, tail=4)
            x_j = gathered[..., :-4].astype(self.dtype)   # (B, S, k, C_in)
            pos_j = gathered[..., -4:]
        pos_i = gather_rows(pos4, center_idx)             # (B, S, 4)
        # geometry in fp32 (relative positions of nearby points would lose
        # ~all precision in bf16); the MLP compute runs in self.dtype.
        rel = pos_j[..., :3] - pos_i[..., None, :3]       # (B, S, k, 3)
        # sqrt(x + tiny), not norm: every center is its own zero-distance
        # neighbor, and d|rel|/d rel = rel/|rel| is NaN at 0 — the max over
        # k multiplies that NaN by a zero gradient, which is still NaN.
        dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-24)  # (B, S, k)
        if radius is not None:
            nbr_valid = nbr_valid & (dist <= radius)
        max_dist = jnp.max(jnp.where(nbr_valid, dist, 0.0), axis=-1, keepdims=True)
        geo = (rel / (max_dist[..., None] + 1e-8)).astype(self.dtype)
        refl_j = pos_j[..., 3:4].astype(self.dtype)
        if stem_edge is not None:
            # Stem-recompute trick (round 3): the stem features are a
            # per-point function of pos3 alone, and gather commutes with
            # per-row functions — stem(pos)[j] == stem(pos[j]). Applying
            # the SHARED stem module to the already-gathered neighbor
            # positions is numerically equivalent to gathering precomputed
            # stem features, but the stem's weight gradients now arrive
            # through the edge matmul (MXU) instead of a 2M-row
            # scatter-add VJP — measured 28 ms/step on the canonical
            # train shape, the single largest backward op.
            # pos4 carries pos3/sf (the conv's scaled frame); the stem was
            # defined on UNSCALED pos3, so scale back per sample.
            pos_un = pos_j[..., :3] * sf[:, None, None, None]
            x_j = stem_edge(
                pos_un, use_running_average=use_running_average
            ).astype(self.dtype)
            msg = jnp.concatenate([x_j, geo, refl_j], axis=-1)
        elif x_j is None:
            msg = jnp.concatenate([geo, refl_j], axis=-1)
        else:
            msg = jnp.concatenate([x_j.astype(self.dtype), geo, refl_j],
                                  axis=-1)
        msg = RefMLP(self.channels, name="local_nn", dtype=self.dtype)(
            msg, mask=nbr_valid, use_running_average=use_running_average
        )
        neg = jnp.finfo(msg.dtype).min
        out = jnp.max(jnp.where(nbr_valid[..., None], msg, neg), axis=-2)
        # centers with no valid neighbors (padding only) -> 0, matching the
        # scatter-max fill for untouched rows.
        any_nbr = jnp.any(nbr_valid, axis=-1) & center_valid
        return jnp.where(any_nbr[..., None], out, 0.0)
