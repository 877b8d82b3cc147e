#!/usr/bin/env python3
"""Decompose the fast-kNN path at the SA1 shape: kernel matmul precision
sweep (time + true recall of the full chained selection), plus the
knn_masked wrapper overhead."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.ops import pallas_knn

B, N, Q, K, G = 8, 16384, 8192, 32, 8
R2 = 0.9  # stage-2 recall target
ITERS = 10

read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(read(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(read(out[0] if isinstance(out, tuple) else out))
    print(f"{label:44s} {(time.perf_counter() - t0) / ITERS * 1000:8.2f} ms")
    return out


def true_recall(idx, q, s, k):
    from scipy.spatial import cKDTree

    sel = np.random.default_rng(0).choice(idx.shape[1], 512, replace=False)
    hits = 0
    nb = min(2, idx.shape[0])
    for b in range(nb):
        tree = cKDTree(s[b])
        _, ti = tree.query(q[b][sel], k=k)
        for i, qi in enumerate(sel):
            hits += len(set(ti[i]) & set(idx[b, qi].tolist()))
    return hits / (nb * 512 * k)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Q, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    qn, sn = np.asarray(q), np.asarray(s)

    for precision in ("default", "bf16x3", "highest"):
        @jax.jit
        def chained(q_, s_, p=precision):
            gm_ = jax.vmap(
                lambda qq, ss: pallas_knn.group_min(
                    qq, ss, jnp.sum(ss * ss, axis=1), G, precision=p)
            )(q_, s_)
            vals, gidx = jax.lax.approx_min_k(gm_, K, recall_target=R2)
            slot = pallas_knn.unpack_slot(vals)
            return pallas_knn.member_index(gidx, slot, N, G), vals

        idx, _ = bench(chained, q, s,
                       label=f"chained kernel[{precision}]+amk@{R2}")
        print(f"  recall: {true_recall(np.asarray(idx), qn, sn, K):.4f}")

    from pointstowood_tpu.ops.knn import knn_masked
    full = jax.jit(jax.vmap(
        lambda qq, ss: knn_masked(qq, ss, k=K, method="fast",
                                  recall_target=R2, with_dist=False)
    ))
    bench(full, q, s, label=f"knn_masked fast r={R2}")


if __name__ == "__main__":
    main()
