#!/usr/bin/env python3
"""A/B the Pallas group-min fold width g=8 vs g=16 at the SA shapes:
kernel+stage-2 latency and true top-k recall (VERDICT r2 item 7 lever).

Run on the real chip: python scripts/knn_g16_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B = 8
K = 32
ITERS = 10

read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def bench(fn, *args):
    out = fn(*args)
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / ITERS, out


def true_topk(q, s, k):
    d = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    return np.argpartition(d, k - 1, axis=1)[:, :k]


def main():
    from pointstowood_tpu.ops import pallas_knn
    from pointstowood_tpu.ops.knn import knn_masked

    rng = np.random.default_rng(0)
    for n, q_n in ((16384, 8192), (8192, 4096), (4096, 2048)):
        s_np = rng.normal(size=(n, 3)).astype(np.float32)
        q_np = s_np[rng.permutation(n)[:q_n]]
        s = jnp.asarray(np.broadcast_to(s_np, (B, n, 3)))
        q = jnp.asarray(np.broadcast_to(q_np, (B, q_n, 3)))
        qm = jnp.ones((B, q_n), bool)
        sm = jnp.ones((B, n), bool)
        truth = true_topk(q_np, s_np, K)
        print(f"shape Q={q_n} N={n}:")
        for g_max, rt in ((8, 0.9), (16, 0.9), (16, 0.95)):
            pallas_knn.G_MAX = g_max
            # G_MAX is read at trace time and is not part of the jit key
            jax.clear_caches()

            def run(q, s, qm, sm):
                return jax.vmap(
                    lambda qq, ss, a, b: knn_masked(
                        qq, ss, k=K, query_mask=a, source_mask=b,
                        method="fast", recall_target=rt, with_dist=False,
                    )[0]
                )(q, s, qm, sm)

            f = jax.jit(run)
            dt, idx = bench(f, q, s, qm, sm)
            idx0 = np.asarray(idx)[0]
            hits = np.mean([
                len(np.intersect1d(idx0[i], truth[i])) / K
                for i in range(0, q_n, 7)
            ])
            print(f"  g_max={g_max:2d} rt={rt}: {dt * 1e3:7.2f} ms  "
                  f"recall={hits:.4f}")
        pallas_knn.G_MAX = 8
        jax.clear_caches()
        print()


if __name__ == "__main__":
    main()
