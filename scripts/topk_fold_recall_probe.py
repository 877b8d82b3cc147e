#!/usr/bin/env python3
"""Recall of group_min_topk fold=128 vs 256 at the SA2 shape (npg=1024).

The fold-width gate (ops/pallas_knn._topk_fold) prefers 128 at npg=1024
on time (scripts/topk_stage_gate_probe.py); this pins that the narrower
fold's higher collision odds (8 slices instead of 4 share each packed
column pair) do not cost measurable recall. Expected per-neighbor loss
stays ~C(k,3)-collision-bounded (~0.02%).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from pointstowood_tpu.ops import pallas_knn

K = 32
N = 8192          # SA2 source count; npg = 8192/8 = 1024
Q = 4096


def main():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(N, 3)).astype(np.float32)
    q = src[:Q]
    pen = jnp.sum(jnp.square(jnp.asarray(src)), axis=1)
    g = pallas_knn.topk_supported(N, K)
    assert g, (N, K)
    _, ref_i = cKDTree(src).query(q, k=K)
    for fold in (256, 128):
        _, idx = pallas_knn.group_min_topk(
            jnp.asarray(q), jnp.asarray(src), pen, g, K, fold=fold)
        ia = np.asarray(idx)
        hits = sum(len(set(map(int, a)) & set(map(int, b)))
                   for a, b in zip(ia, ref_i))
        print(f"fold={fold}: recall {hits / ia.size:.4f}", flush=True)


if __name__ == "__main__":
    main()
