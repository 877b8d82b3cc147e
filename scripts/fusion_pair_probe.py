#!/usr/bin/env python3
"""Probe the fused (fine, coarse) pair-kNN dispatch cost drivers at the
bench plot's dominant shape: per-entry amk recall target, k_out=64 union
vs 32+32 per-scale split, and the fast vs approx selection path.

Context: the warm 1M-pt plot spends ~3.7 s in ~90 pair dispatches over
~1.6M query slots (scripts/e2e_warm_profile.py) — ~2.2 us/slot, far above
the matmul floor, pointing at approx_min_k row overhead (k=64 doubles the
PartialReduce width vs the model kNN's k=32)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.ops.knn import knn_masked

PQ, GROUP = 1024, 16
CAP_F = CAP_C = 16384
ITERS = 5

read = jax.jit(lambda x: x.sum())


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(read(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(read(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    per_slot = dt / (GROUP * PQ) * 1000
    print(f"{label:52s} {dt:8.2f} ms/dispatch  {per_slot:6.2f} us/slot")


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(GROUP, PQ, 3)).astype(np.float32))
    sf = jnp.asarray(rng.normal(size=(GROUP, CAP_F, 3)).astype(np.float32))
    sc = jnp.asarray(rng.normal(size=(GROUP, CAP_C, 3)).astype(np.float32))

    def union(qq, a, b, k, r, method):
        s = jnp.concatenate([a, b], axis=0)
        i, _, vm = knn_masked(qq, s, k=k, method=method, recall_target=r,
                              with_dist=False)
        return i

    def split(qq, a, b, r, method):
        ia, _, _ = knn_masked(qq, a, k=32, method=method, recall_target=r,
                              with_dist=False)
        ib, _, _ = knn_masked(qq, b, k=32, method=method, recall_target=r,
                              with_dist=False)
        return ia, ib

    for r in (0.9, 0.8, 0.7):
        f = jax.jit(jax.vmap(
            lambda qq, a, b, r=r: union(qq, a, b, 64, r, "fast")))
        bench(f, q, sf, sc, label=f"union fast k=64 r={r}")
    for r in (0.9, 0.8):
        f = jax.jit(jax.vmap(
            lambda qq, a, b, r=r: split(qq, a, b, r, "fast")))
        bench(f, q, sf, sc, label=f"split fast 32+32 r={r}")
    f = jax.jit(jax.vmap(lambda qq, a, b: union(qq, a, b, 64, 0.9, "approx")))
    bench(f, q, sf, sc, label="union approx k=64 r=0.9")
    f = jax.jit(jax.vmap(lambda qq, a, b: union(qq, a, b, 32, 0.9, "fast")))
    bench(f, q, sf, sc, label="union fast k=32 r=0.9 (any_wood!=1 path)")


if __name__ == "__main__":
    main()
