#!/usr/bin/env python3
"""Probe: gather_rows backward strategies at the SA-stage shapes.

The train-step backward is 1.77x the forward (BASELINE.md); the suspected
dominant extra is the scatter-add VJP of the neighbor gathers. This probe
times, per SA stage shape (B=8 canonical):

  fwd        the gather itself
  xla-vjp    grad via XLA's native gather VJP (scatter-add)
  sort-vjp   grad via sort + cumsum + two unique scatters
  argsort    the sort-vjp's argsort component alone

Run on the real chip: python scripts/gather_bwd_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B = 8
ITERS = 10

read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {label:42s} {dt * 1000:8.2f} ms")
    return dt


def flat_gather(arr, idx):
    b, n, c = arr.shape
    flat_idx = idx.reshape(b, -1) + (
        jnp.arange(b, dtype=jnp.int32) * jnp.int32(n)
    )[:, None]
    out = arr.reshape(b * n, c)[flat_idx.reshape(-1)]
    return out.reshape(idx.shape + (c,))


def sort_scatter_add(flat_idx, g, n_rows):
    """sum g rows by target: sort, cumsum, two unique-index scatters."""
    order = jnp.argsort(flat_idx)
    si = flat_idx[order]
    gs = g[order]
    csum = jnp.cumsum(gs.astype(jnp.float32), axis=0)
    m = si.shape[0]
    is_last = jnp.concatenate(
        [si[1:] != si[:-1], jnp.ones((1,), bool)]
    )
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), si[1:] != si[:-1]]
    )
    oob = jnp.int32(n_rows)
    tgt_last = jnp.where(is_last, si, oob)
    tgt_first = jnp.where(is_first, si, oob)
    prev = jnp.concatenate([jnp.zeros((1, g.shape[1]), jnp.float32),
                            csum[:-1]], axis=0)
    out = jnp.zeros((n_rows, g.shape[1]), jnp.float32)
    out = out.at[tgt_last].add(csum, mode="drop", unique_indices=True)
    out = out.at[tgt_first].add(-prev, mode="drop", unique_indices=True)
    return out


def main():
    rng = np.random.default_rng(0)
    # (N_src, S_centers, k, C_src): SA1..SA3 shapes of the C=32 net, plus
    # the FP-stage k=2 interpolation gathers
    shapes = [
        ("SA1", 16384, 8192, 32, 4),
        ("SA2", 8192, 4096, 32, 68),
        ("SA3", 4096, 2048, 32, 132),
        ("FP-k2", 16384, 16384, 2, 64),
    ]
    for name, n, s, k, c in shapes:
        arr = jnp.asarray(rng.normal(size=(B, n, c)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, n, size=(B, s, k)).astype(np.int32))
        w = jnp.asarray(rng.normal(size=(B, s, k, c)).astype(np.float32))
        print(f"{name}: arr (B,{n},{c}), idx (B,{s},{k})")

        f = jax.jit(lambda a, i, w: (flat_gather(a, i) * w).sum())
        bench(jax.jit(lambda a, i: flat_gather(a, i)), arr, idx,
              label="fwd gather")
        bench(jax.jit(jax.grad(f)), arr, idx, w, label="xla-vjp (scatter-add)")

        b_, n_, c_ = arr.shape
        flat_idx = np.asarray(idx.reshape(b_, -1)) + (
            np.arange(b_) * n_)[:, None]
        flat_idx = jnp.asarray(flat_idx.reshape(-1).astype(np.int32))
        g = jnp.asarray(
            rng.normal(size=(flat_idx.shape[0], c)).astype(np.float32))
        bench(jax.jit(lambda fi, g: sort_scatter_add(fi, g, b_ * n_)),
              flat_idx, g, label="sort-vjp (argsort+cumsum+2 scatters)")
        bench(jax.jit(lambda fi: jnp.argsort(fi)), flat_idx,
              label="argsort alone")
        print()


if __name__ == "__main__":
    main()
