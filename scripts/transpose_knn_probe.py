#!/usr/bin/env python3
"""Size the transpose-kNN fusion opportunity (round 5).

FP1/FP2's k=2 searches are the TRANSPOSE of SA1/SA2's kNN: FP targets =
the SA stage's source cloud, FP sources = the SA stage's query centers,
and d(p, c) is symmetric — so a per-COLUMN top-2 fold inside
group_min_topk could delete the separate top2 dispatches entirely.

Phase 1 (this script, before building the kernel): what do those
dispatches cost standalone at the canonical eval shapes, and what does
the SA kernel cost today (the baseline the extended kernel must stay
near)?

  top2 @ FP1 shape   (B=8, Q=16384 targets, S=8192 sources)
  top2 @ FP2 shape   (B=8, Q= 8192 targets, S=4096 sources)
  group_min_topk @ SA1 (B=8, Q=8192 centers, N=16384, k=32)
  group_min_topk @ SA2 (B=8, Q=4096 centers, N= 8192, k=32)

Phase 2 (after building group_min_topk_t): A/B the extended kernel's
combined cost against (group_min_topk + top2) and check transpose top-2
exactness vs a brute-force oracle.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.ops import pallas_knn

B = 8
ITERS = 10

read = jax.jit(lambda a: jnp.asarray(a[0] if isinstance(a, tuple) else a,
                                     jnp.float32).sum())


def bench(label, fn, *args):
    out = fn(*args)
    np.asarray(read(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(read(out))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:52s} {dt * 1000:8.2f} ms")
    return dt


def main():
    from pointstowood_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    phase2_only = "phase2" in sys.argv[1:]
    rng = np.random.default_rng(0)

    def mk(q_n, n):
        q = jnp.asarray(rng.normal(size=(B, q_n, 3)).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(B, n, 3)).astype(np.float32))
        pen = jnp.sum(s * s, axis=-1)
        return q, s, pen

    if not phase2_only:
        # the separate FP searches the transpose would delete
        for label, q_n, n in (("top2 @ FP1 (16384q x 8192s)", 16384, 8192),
                              ("top2 @ FP2 ( 8192q x 4096s)", 8192, 4096)):
            q, s, pen = mk(q_n, n)
            fn = jax.jit(jax.vmap(pallas_knn.top2))
            bench(label, fn, q, s, pen)

        # today's SA kernels (baseline for the extended variant)
        for label, q_n, n in (
            ("group_min_topk @ SA1 (8192q x 16384s)", 8192, 16384),
            ("group_min_topk @ SA2 (4096q x  8192s)", 4096, 8192),
        ):
            q, s, pen = mk(q_n, n)
            g = pallas_knn.topk_supported(n, 32)
            fn = jax.jit(jax.vmap(
                lambda qq, ss, pp: pallas_knn.group_min_topk(
                    qq, ss, pp, g, 32)))
            bench(label, fn, q, s, pen)

    if hasattr(pallas_knn, "group_min_topk_t"):
        print("--- phase 2: extended kernel ---")
        for label, q_n, n in (
            ("group_min_topk_t @ SA1 (fwd k=32 + transpose-2)", 8192, 16384),
            ("group_min_topk_t @ SA2 (fwd k=32 + transpose-2)", 4096, 8192),
        ):
            q, s, pen = mk(q_n, n)
            g = pallas_knn.topk_supported(n, 32)
            qpen = jnp.zeros(q.shape[:2], jnp.float32)
            fn = jax.jit(
                lambda qq, ss, pp, qp: pallas_knn.group_min_topk_t(
                    qq, ss, pp, qp, g, 32))
            bench(label, fn, q, s, pen, qpen)


if __name__ == "__main__":
    main()
