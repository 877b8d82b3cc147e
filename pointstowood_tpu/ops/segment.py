"""Segment reductions over padded id arrays.

TPU-native replacement for the torch-scatter kernels the reference leans on
(scatter_max at pointnet.py:122, scatter_min at preprocessing.py:49,
global_max_pool at model.py:136): thin masked wrappers over XLA's native
segment ops with a static ``num_segments``.

Most of the rebuilt model avoids segments entirely (fixed-k gathers +
masked axis reductions), but these remain first-class for device-side
preprocessing and per-sample pooling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _masked(data, mask, fill):
    if mask is None:
        return data
    shape = mask.shape + (1,) * (data.ndim - mask.ndim)
    return jnp.where(mask.reshape(shape), data, fill)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_max(data, segment_ids, num_segments: int, mask=None):
    """Per-segment max; empty segments yield 0 (matching torch-scatter's
    fill of the output's default value for 'max' reduction on floats)."""
    out = jax.ops.segment_max(
        _masked(data, mask, -jnp.inf), segment_ids, num_segments=num_segments
    )
    return jnp.where(jnp.isfinite(out), out, 0.0)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_min(data, segment_ids, num_segments: int, mask=None):
    out = jax.ops.segment_min(
        _masked(data, mask, jnp.inf), segment_ids, num_segments=num_segments
    )
    return jnp.where(jnp.isfinite(out), out, 0.0)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_sum(data, segment_ids, num_segments: int, mask=None):
    return jax.ops.segment_sum(
        _masked(data, mask, 0.0), segment_ids, num_segments=num_segments
    )


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_mean(data, segment_ids, num_segments: int, mask=None):
    total = segment_sum(data, segment_ids, num_segments, mask)
    ones = jnp.ones(data.shape[: segment_ids.ndim], dtype=jnp.float32)
    count = segment_sum(ones, segment_ids, num_segments, mask)
    count = count.reshape(count.shape + (1,) * (total.ndim - count.ndim))
    return total / jnp.maximum(count, 1.0)
