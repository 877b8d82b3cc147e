"""Masked kNN inverse-distance interpolation.

TPU-native replacement for PyG ``knn_interpolate`` (used by the FP decoder
stages, reference: pointstowood/src/model.py:149): gather the k nearest
source points per target and average their features weighted by inverse
squared distance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pointstowood_tpu.ops.knn import knn_masked


@functools.partial(jax.jit, static_argnames=("k", "chunk_size", "method"))
def knn_interpolate(
    x: jax.Array,
    pos: jax.Array,
    target_pos: jax.Array,
    k: int = 2,
    source_mask: jax.Array | None = None,
    target_mask: jax.Array | None = None,
    chunk_size: int = 2048,
    method: str = "approx",
) -> jax.Array:
    """Interpolate (S, C) features at (T, 3) target positions.

    weights = 1 / max(d^2, 1e-16), matching PyG's clamped inverse squared
    distance; masked-out neighbor slots contribute zero weight. Targets with
    no valid neighbors (only possible for padded rows) get zeros.
    """
    idx, d2, valid = knn_masked(
        target_pos, pos, k,
        query_mask=target_mask, source_mask=source_mask, chunk_size=chunk_size,
        method=method,
    )
    w = 1.0 / jnp.maximum(d2, 1e-16)
    w = jnp.where(valid, w, 0.0)
    feats = x[idx]  # (T, k, C)
    # where(), not feats * 0: invalid-slot features may hold inf garbage
    num = jnp.sum(jnp.where(valid[..., None], feats * w[..., None], 0.0), axis=1)
    den = jnp.sum(w, axis=1, keepdims=True)
    return num / jnp.maximum(den, 1e-16)


def uses_fused_kernel(t_n: int, s_n: int, channels: int, k: int,
                      method: str, fused_max_sources: int) -> bool:
    """Whether ``knn_interpolate_batched`` will take the fused Pallas
    path at these static shapes — the ONE decision point, shared with
    callers (Net) that precompute transpose neighbors only for the
    gather-path stages."""
    if k != 2 or method != "fast" or s_n > fused_max_sources:
        return False
    from pointstowood_tpu.ops import pallas_interp

    return pallas_interp.fused_supported(t_n, s_n, channels)


@functools.partial(
    jax.jit,
    static_argnames=("k", "chunk_size", "method", "fused_max_sources"),
)
def knn_interpolate_batched(
    x: jax.Array,
    pos: jax.Array,
    target_pos: jax.Array,
    k: int = 2,
    source_mask: jax.Array | None = None,
    target_mask: jax.Array | None = None,
    chunk_size: int = 2048,
    method: str = "approx",
    fused_max_sources: int = 2048,
    precomputed: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """Batched variant: x (B, S, C), pos (B, S, 3), target (B, T, 3) ->
    (B, T, C). The neighbor search is vmapped per sample (sources are
    per-sample), but the feature gather is one flat global row gather —
    the faster TPU formulation (see pointconv.gather_rows).

    ``precomputed``: optional (idx (B, T, k) int32, valid (B, T, k)
    bool) neighbor arrays — the SA stage's transpose top-2
    (ops/knn.knn_topk_with_transpose) — used on the gather path instead
    of searching. Takes PRECEDENCE over the fused kernel: with the
    search cost already paid inside the SA kernel, the gather
    formulation beats the fused quadratic tile work at the shapes where
    the caller asks for a transpose (Net decides per stage)."""
    from pointstowood_tpu.model.pointconv import gather_rows

    def search(q, s, qm, sm):
        # with_dist=False: exact distances are recomputed below from the
        # SAME gather that fetches the features (one fused row gather
        # instead of two — row gathers are op-overhead bound on TPU, so
        # halving the row count halves the cost).
        return knn_masked(
            q, s, k,
            query_mask=qm, source_mask=sm, chunk_size=chunk_size,
            method=method, with_dist=False,
        )

    b = x.shape[0]
    smask = jnp.ones(pos.shape[:2], bool) if source_mask is None else source_mask
    tmask = (
        jnp.ones(target_pos.shape[:2], bool) if target_mask is None else target_mask
    )
    if precomputed is None and uses_fused_kernel(
            target_pos.shape[1], pos.shape[1], x.shape[-1],
            k, method, fused_max_sources):
        from pointstowood_tpu.ops import pallas_interp

        # Fused threshold-select + weighted-sum kernel: no neighbor
        # gather forward, no scatter-add VJP backward. Its dense
        # (T, S) tile work scales quadratically, so it only wins on
        # the smaller FP stages — measured on v5e (fwd+bwd, canonical
        # train shapes): FP3 7.4 vs 10.0 ms, FP2 14.7 vs 16.2,
        # FP1 41.1 vs 34.2 (scripts/interp_scatter_probe.py). The
        # caller bounds dispatch via fused_max_sources: 4096 for
        # training, 2048 for eval (FP2's fused FORWARD alone is
        # slower than the gather path).
        y = pallas_interp.fp_interpolate_fast(x, pos, target_pos, smask)
        return jnp.where(tmask[..., None], y, 0)
    if precomputed is not None:
        idx, valid = precomputed
    else:
        idx, _, valid = jax.vmap(search)(target_pos, pos, tmask, smask)
    if x.dtype == jnp.bfloat16:
        # Packed-bf16 fused gather: wide-row gathers are byte-limited well
        # below HBM bandwidth (scripts/gather_width_probe.py: 9.7 -> 6.1 ms
        # at the FP1 shape), so carry the features in their native bf16 and
        # the fp32 positions as exact bf16 hi/lo channel pairs
        # (reconstruction error <= |pos| * 2^-17, far inside the bf16
        # message quantization the features already see). The 6 geometry
        # channels carry no live gradient -> dead-tail VJP scatters only
        # the bf16 feature head (12.6 -> 10.3 ms).
        from pointstowood_tpu.model.pointconv import gather_rows_deadtail

        hi = pos.astype(jnp.bfloat16)
        lo = (pos - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        packed = jnp.concatenate([x, hi, lo], axis=-1)  # (B, S, C+6) bf16
        gathered = gather_rows_deadtail(packed, idx, tail=6)
        feats = gathered[..., :-6]
        pos_j = (gathered[..., -6:-3].astype(jnp.float32)
                 + gathered[..., -3:].astype(jnp.float32))
    else:
        gathered = gather_rows(
            jnp.concatenate([x.astype(jnp.float32), pos], axis=-1), idx
        )  # (B, T, k, C+3)
        feats = gathered[..., :-3].astype(x.dtype)
        pos_j = gathered[..., -3:]
    rel = pos_j - target_pos[:, :, None, :]
    d2 = jnp.sum(rel * rel, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    w = 1.0 / jnp.maximum(d2, 1e-16)
    w = jnp.where(valid, w, 0.0)
    # where(), not feats * 0: invalid-slot features may hold inf garbage
    num = jnp.sum(
        jnp.where(valid[..., None], feats * w[..., None].astype(feats.dtype), 0.0),
        axis=2,
    )
    den = jnp.sum(w, axis=2, keepdims=True)
    return num / jnp.maximum(den, 1e-16).astype(num.dtype)
