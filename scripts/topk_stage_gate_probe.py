#!/usr/bin/env python3
"""Per-SA-stage A/B of the in-kernel top-k vs the group_min+amk two-stage
path: the extraction runs k passes over a fixed (QB, 2*fold) candidate
matrix, so its cost does NOT shrink with n — small stages may prefer the
old path. Decides the shape gate in ops/knn.py."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.ops import pallas_knn

K = 32
SHAPES = [(8192, 16384), (4096, 8192), (2048, 4096)]  # (Q, N) per tile, B=8
B = 8


@functools.partial(jax.jit, static_argnames=("g", "recall"))
def two_stage(q, s, penalty, g, recall=0.9):
    gmin = pallas_knn.group_min(q, s, penalty, g)
    vals, gidx = jax.lax.approx_min_k(gmin, K, recall_target=recall)
    slot = pallas_knn.unpack_slot(vals)
    return pallas_knn.member_index(gidx, slot, s.shape[0], g), vals


@functools.partial(jax.jit, static_argnames=("g", "fold"))
def in_kernel(q, s, penalty, g, fold=None):
    vals, idx = pallas_knn.group_min_topk(q, s, penalty, g, K, fold=fold)
    return idx, vals


def timeit(fn, args, iters=30):
    reduce = jax.jit(lambda t: t[0].sum() + t[1].sum())
    np.asarray(reduce(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(reduce(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    for q_n, n in SHAPES:
        pos = rng.normal(size=(B, n, 3)).astype(np.float32)
        s = jnp.asarray(pos)
        q = s[:, :q_n]
        pen = jnp.sum(s * s, axis=-1)
        g = pallas_knn.topk_supported(n, K)
        assert g, (n, K)
        # interleaved repeats: the relay's run-to-run variance can exceed
        # the effect size, so each variant is timed REPS times round-robin
        # and the per-variant MIN is the comparison number. fold=128
        # halves the extraction matrix (the fixed width that does not
        # shrink with n) at slightly higher collision odds — candidate
        # gate for the small stages.
        reps = 3
        npg = n // g
        variants = {"two-stage": jax.vmap(functools.partial(two_stage, g=g)),
                    "in-kernel(256)": jax.vmap(
                        functools.partial(in_kernel, g=g))}
        for fold in (128, 64):
            if (npg % fold == 0 and npg // fold <= 8 and K <= 2 * fold
                    and pallas_knn._topk_fold(npg) != fold):
                variants[f"in-kernel({fold})"] = jax.vmap(
                    functools.partial(in_kernel, g=g, fold=fold))
        times = {name: [] for name in variants}
        for _ in range(reps):
            for name, fn in variants.items():
                times[name].append(timeit(fn, (q, s, pen)))
        print(f"(Q={q_n:5d}, N={n:5d})", flush=True)
        for name, ts in times.items():
            print(f"  {name:15s} {min(ts):6.2f} ms "
                  f"{[round(t, 1) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
