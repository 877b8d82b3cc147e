"""Fixed-count masked sampling primitives.

Replaces the reference's dynamic-size sampling (random 50% at train time,
voxel-grid representatives at eval time — reference: pointstowood/src/model.py:97-106)
with static-capacity selections + validity masks, keeping every stage shape
known to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("capacity",))
def compact_indices(select: jax.Array, capacity: int):
    """Compact the indices of True entries into ``capacity`` slots.

    Returns (idx (capacity,) int32 ascending, valid (capacity,) bool).
    Overflow keeps the lowest indices.
    """
    n = select.shape[0]
    key = jnp.where(select, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    key = jnp.sort(key)[:capacity]
    valid = key < n
    return jnp.where(valid, key, 0), valid


@functools.partial(jax.jit, static_argnames=("capacity",))
def random_sample(rng: jax.Array, mask: jax.Array, capacity: int, fraction: float = 0.5):
    """Uniformly sample ``floor(n_valid * fraction)`` valid points without
    replacement into ``capacity`` slots (reference random_sample at
    model.py:97-101 picks exactly 50% and returns sorted indices).

    Returns (idx (capacity,) int32 ascending, valid (capacity,) bool).
    """
    n = mask.shape[0]
    n_valid = jnp.sum(mask)
    n_take = jnp.minimum((n_valid * fraction).astype(jnp.int32), capacity)
    score = jax.random.uniform(rng, (n,))
    score = jnp.where(mask, score, jnp.inf)  # invalid points sort last
    order = jnp.argsort(score)
    chosen = jnp.arange(n) < n_take  # first n_take of the shuffled valid points
    select = jnp.zeros(n, dtype=bool).at[order].set(chosen)
    return compact_indices(select, capacity)
