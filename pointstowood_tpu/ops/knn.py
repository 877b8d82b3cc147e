"""Fixed-k masked neighbor search over static-shape point sets.

TPU-native replacement for the torch-cluster ``knn``/``radius`` CUDA kernels
the reference model calls per SA stage (reference: pointstowood/src/model.py:117-120).
Instead of variable-length edge lists, these return dense ``(Q, k)`` neighbor
index arrays plus validity masks — the layout the rest of the model consumes
directly with gathers (no scatter needed).

The implementation streams over source chunks with ``lax.scan`` and keeps a
running top-k: each step computes a ``(Q, chunk)`` block of squared
distances via one matmul (MXU) and merges it into the ``(Q, k)`` best-so-far
with ``lax.top_k``. Peak memory is ``O(Q * (k + chunk))`` regardless of
source size. A Pallas kernel with the same contract lives in
``knn_pallas.py`` for the hot path; this XLA version is the reference
implementation and fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.inf


def _chunk_topk_merge(carry, chunk, *, k):
    """Merge one (Q, C) distance chunk into the running (Q, k) best."""
    best_d, best_i = carry
    d2, idx = chunk
    cat_d = jnp.concatenate([best_d, d2], axis=1)
    cat_i = jnp.concatenate([best_i, idx], axis=1)
    # top_k of negated distances = k smallest; ties resolve to the lower
    # concat position, i.e. earlier chunks / earlier source indices win,
    # giving deterministic first-found semantics.
    neg_d, pos = jax.lax.top_k(-cat_d, k)
    return (-neg_d, jnp.take_along_axis(cat_i, pos, axis=1)), None


@functools.partial(jax.jit, static_argnames=("k", "chunk_size"))
def knn_masked(
    query_pos: jax.Array,
    source_pos: jax.Array,
    k: int,
    query_mask: jax.Array | None = None,
    source_mask: jax.Array | None = None,
    chunk_size: int = 2048,
):
    """Exact k-nearest-neighbors from each query to the valid source points.

    Args:
      query_pos: (Q, D) float array.
      source_pos: (N, D) float array.
      k: number of neighbors.
      query_mask: (Q,) bool; invalid queries produce arbitrary (masked) rows.
      source_mask: (N,) bool; invalid sources are never selected.
      chunk_size: source points per scan step.

    Returns:
      idx: (Q, k) int32 indices into source_pos (0 where invalid).
      dist2: (Q, k) squared distances (+inf where invalid).
      valid: (Q, k) bool — neighbor slot holds a real valid source and the
        query itself is valid.
    """
    q = query_pos.astype(jnp.float32)
    s = source_pos.astype(jnp.float32)
    n = s.shape[0]
    pad = (-n) % chunk_size
    if pad:
        s = jnp.pad(s, ((0, pad), (0, 0)))
    smask = jnp.ones(n, dtype=bool) if source_mask is None else source_mask
    smask = jnp.pad(smask, (0, pad), constant_values=False)
    n_chunks = s.shape[0] // chunk_size

    s_chunks = s.reshape(n_chunks, chunk_size, -1)
    m_chunks = smask.reshape(n_chunks, chunk_size)
    i_chunks = jnp.arange(s.shape[0], dtype=jnp.int32).reshape(n_chunks, chunk_size)

    q_sq = jnp.sum(q * q, axis=1, keepdims=True)  # (Q, 1)

    def step(carry, xs):
        s_c, m_c, i_c = xs
        # d2 = |q|^2 - 2 q.s + |s|^2 ; the cross term is the matmul. Full
        # fp32 precision: the TPU default (bf16 passes) perturbs distances
        # enough to flip near-tie neighbor ordering and radius masks.
        cross = jnp.dot(q, s_c.T, precision=jax.lax.Precision.HIGHEST)
        d2 = q_sq - 2.0 * cross + jnp.sum(s_c * s_c, axis=1)[None, :]
        d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(m_c[None, :], d2, _INF)
        idx = jnp.broadcast_to(i_c[None, :], d2.shape)
        return _chunk_topk_merge(carry, (d2, idx), k=k)

    init = (
        jnp.full((q.shape[0], k), _INF, dtype=jnp.float32),
        jnp.zeros((q.shape[0], k), dtype=jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(step, init, (s_chunks, m_chunks, i_chunks))

    valid = jnp.isfinite(best_d)
    if query_mask is not None:
        valid = valid & query_mask[:, None]
    best_i = jnp.where(valid, best_i, 0)
    return best_i, best_d, valid


@functools.partial(jax.jit, static_argnames=("k", "chunk_size"))
def radius_masked(
    query_pos: jax.Array,
    source_pos: jax.Array,
    radius: float,
    k: int,
    query_mask: jax.Array | None = None,
    source_mask: jax.Array | None = None,
    chunk_size: int = 2048,
):
    """Radius search capped at k neighbors.

    Reference semantics (torch-cluster ``radius`` at model.py:118): up to k
    neighbors within ``radius``. The reference keeps the first k found in
    scan order; here we keep the k *nearest* within the radius, which is a
    strict refinement with identical output shape.
    """
    idx, dist2, valid = knn_masked(
        query_pos, source_pos, k,
        query_mask=query_mask, source_mask=source_mask, chunk_size=chunk_size,
    )
    in_r = dist2 <= jnp.float32(radius) ** 2
    valid = valid & in_r
    return jnp.where(valid, idx, 0), jnp.where(valid, dist2, _INF), valid
