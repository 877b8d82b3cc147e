#!/usr/bin/env python3
"""Probe the kNN selection operator itself: approx_min_k vs top_k vs
min/argmin sweeps on a precomputed distance matrix, plus the bare matmul,
at the SA1 shape. Decides where the ~20 ms SA1 kNN actually goes and which
selection primitive the ops should use per k.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B, N, Q = 8, 16384, 8192
ITERS = 10

read = jax.jit(lambda x: jnp.asarray(x[0] if isinstance(x, tuple) else x,
                                     jnp.float32).sum())


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(read(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(read(out))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:44s} {dt * 1000:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Q, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(B, Q, N)).astype(np.float32))

    # bare distance matmul
    @jax.jit
    def dist_only(q, s):
        def per(qq, ss):
            return (
                jnp.sum(qq * qq, axis=1, keepdims=True)
                - 2.0 * jnp.dot(qq, ss.T)
                + jnp.sum(ss * ss, axis=1)[None, :]
            )
        return jax.vmap(per)(q, s)

    bench(dist_only, q, s, label="distance matrix only (fp32 out)")

    for k in (32, 2):
        bench(jax.jit(lambda d_, k=k: jax.lax.approx_min_k(d_, k)), d,
              label=f"approx_min_k k={k} (precomputed d)")
    # (top_k on the full matrix OOMs: XLA sorts the whole (B, Q, N) with a
    # value+index copy = 8.6 GB of temps — not a usable primitive here.)
    bench(jax.jit(lambda d_: (jnp.min(d_, axis=-1), jnp.argmin(d_, axis=-1))),
          d, label="min+argmin k=1 (precomputed d)")

    @jax.jit
    def argmin2(d_):
        i1 = jnp.argmin(d_, axis=-1)
        v1 = jnp.take_along_axis(d_, i1[..., None], axis=-1)
        iota = jax.lax.broadcasted_iota(jnp.int32, d_.shape, 2)
        d2_ = jnp.where(iota == i1[..., None], jnp.inf, d_)
        i2 = jnp.argmin(d2_, axis=-1)
        v2 = jnp.take_along_axis(d_, i2[..., None], axis=-1)
        return jnp.concatenate([v1, v2], -1), jnp.stack([i1, i2], -1)

    bench(argmin2, d, label="double argmin k=2 (precomputed d)")

    # fused: matmul + selection under one jit (what the op actually does)
    for qb in (2048, 4096, 8192):
        @jax.jit
        def fused(q, s, qb=qb):
            def per(qq, ss):
                s_sq = jnp.sum(ss * ss, axis=1)

                def step(_, blk):
                    d2 = (
                        jnp.sum(blk * blk, axis=1, keepdims=True)
                        - 2.0 * jnp.dot(blk, ss.T)
                        + s_sq[None, :]
                    )
                    return None, jax.lax.approx_min_k(d2, 32)

                blocks = qq.reshape(Q // qb, qb, 3)
                _, (vals, idx) = jax.lax.scan(step, None, blocks)
                return vals.reshape(Q, 32), idx.reshape(Q, 32)
            return jax.vmap(per)(q, s)

        bench(fused, q, s, label=f"fused matmul+approx_min_k qb={qb}")


if __name__ == "__main__":
    main()
