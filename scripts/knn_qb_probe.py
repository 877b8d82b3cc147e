#!/usr/bin/env python3
"""A/B the group-min kernel's grid shape at the SA1 shape (B=8, Q=8192,
N=16384): QUERY_BLOCK 128 (prod) vs 256, and N_BLOCK 16384 (one step)
vs 8192 (two steps, block-local grouping). Larger query blocks amortize
per-grid-step overhead; the VMEM question is whether the live min-tree
tiles still fit. Run on TPU; each variant compiles fresh (~30 s relay).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.ops import pallas_knn

B, Q, N, K, G = 8, 8192, 16384, 32, 8
ITERS = 10
read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(read(out[0]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(read(out[0]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:40s} {dt * 1000:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Q, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    def run(q, s):
        pen = jnp.sum(s * s, axis=1)
        gm = pallas_knn.group_min(q, s, pen, G)
        vals, gidx = jax.lax.approx_min_k(gm, K, recall_target=0.9)
        slot = pallas_knn.unpack_slot(vals)
        return pallas_knn.member_index(gidx, slot, N, G), vals

    for qb, nb in [(128, 16384), (256, 8192), (256, 16384), (512, 8192)]:
        pallas_knn.QUERY_BLOCK = qb
        pallas_knn.N_BLOCK_MAX = nb
        try:
            idx, _ = bench(jax.jit(jax.vmap(run)), q, s,
                           label=f"QB={qb} N_BLOCK={nb}")
        except Exception as e:  # noqa: BLE001
            print(f"QB={qb} N_BLOCK={nb}: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        # recall spot-check on one batch row
        d2 = np.sum(
            (np.asarray(q[0])[:256, None, :] - np.asarray(s[0])[None])**2,
            axis=-1)
        true = np.argsort(d2, axis=1)[:, :K]
        got = np.asarray(idx[0][:256])
        rec = np.mean([len(set(got[i]) & set(true[i])) / K
                       for i in range(256)])
        print(f"    recall {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
