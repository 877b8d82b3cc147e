#!/usr/bin/env python3
"""Probe: method='fast' (Pallas fused distance+group-min, ops/pallas_knn.py)
vs method='approx' (unfused bf16 matmul + approx_min_k) at the SA1 shape,
vmapped over batch exactly as the model calls it. Reports wall time + true
recall vs a KD-tree oracle.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.ops.knn import knn_masked

B, N, Q, K = 8, 16384, 8192, 32
ITERS = 10

read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def bench(method, q, s, recall=0.95):
    fn = jax.jit(jax.vmap(
        lambda qq, ss: knn_masked(qq, ss, k=K, method=method,
                                  recall_target=recall, with_dist=False)
    ))
    t0 = time.perf_counter()
    idx, _, valid = fn(q, s)
    np.asarray(read(idx))
    print(f"{method:8s} first call (compile): {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    for _ in range(ITERS):
        idx, _, valid = fn(q, s)
    np.asarray(read(idx))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{method:8s} {dt * 1000:8.2f} ms")
    return np.asarray(idx)


def true_recall(idx, q, s, k):
    from scipy.spatial import cKDTree

    sel = np.random.default_rng(0).choice(idx.shape[1], 512, replace=False)
    hits = 0
    nb = min(2, idx.shape[0])
    for b in range(nb):
        tree = cKDTree(s[b])
        _, true_idx = tree.query(q[b][sel], k=k)
        for i, qi in enumerate(sel):
            hits += len(set(true_idx[i]) & set(idx[b, qi]))
    return hits / (nb * 512 * k)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Q, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    qn, sn = np.asarray(q), np.asarray(s)
    for spec in sys.argv[1:] or ("approx", "fast"):
        method, _, r = spec.partition("@")
        recall = float(r) if r else 0.95
        idx = bench(method, q, s, recall)
        print(f"recall {spec}: {true_recall(idx, qn, sn, K):.4f}")


if __name__ == "__main__":
    main()
