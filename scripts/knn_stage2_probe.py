#!/usr/bin/env python3
"""Probe stage-2 selectors on the (Q, N/8) group-min matrix: approx_min_k
variants, top_k, and batch reshapes. Decides the fast-kNN stage-2 op."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B, Q, NG, K = 8, 8192, 2048, 32
ITERS = 10

read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def bench(fn, *args, label=""):
    try:
        out = fn(*args)
        np.asarray(read(out[0] if isinstance(out, tuple) else out))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        np.asarray(read(out[0] if isinstance(out, tuple) else out))
        print(f"{label:44s} {(time.perf_counter() - t0) / ITERS * 1000:8.2f} ms")
    except Exception as e:
        print(f"{label:44s} FAILED {type(e).__name__}: {str(e)[:150]}")


def main():
    rng = np.random.default_rng(0)
    d3 = jnp.asarray(rng.normal(size=(B, Q, NG)).astype(np.float32))
    d2 = d3.reshape(B * Q, NG)

    bench(jax.jit(lambda x: jax.lax.approx_min_k(x, K, recall_target=0.95)),
          d3, label="approx_min_k (B, Q, NG) r=0.95")
    bench(jax.jit(lambda x: jax.lax.approx_min_k(x, K, recall_target=0.95)),
          d2, label="approx_min_k (B*Q, NG) r=0.95")
    bench(jax.jit(lambda x: jax.lax.approx_min_k(x, K, recall_target=0.8)),
          d3, label="approx_min_k r=0.80")
    bench(jax.jit(lambda x: jax.lax.approx_min_k(
        x, K, recall_target=0.95, aggregate_to_topk=False)),
        d3, label="approx_min_k aggregate_to_topk=False")
    bench(jax.jit(lambda x: jax.lax.top_k(-x, K)), d3,
          label="top_k (B, Q, NG)")
    bench(jax.jit(lambda x: jnp.min(x, axis=-1)), d3,
          label="plain min (read floor)")
    # iterative extraction: K passes of min+mask
    @jax.jit
    def iter_extract(x):
        def step(carry, _):
            xx = carry
            v = jnp.min(xx, axis=-1)
            i = jnp.argmin(xx, axis=-1)
            iota = jax.lax.broadcasted_iota(jnp.int32, xx.shape, xx.ndim - 1)
            xx = jnp.where(iota == i[..., None], jnp.inf, xx)
            return xx, (v, i)
        _, (vals, idx) = jax.lax.scan(step, x, None, length=K)
        return vals, idx
    bench(iter_extract, d3, label="iterative min-extract x32")


if __name__ == "__main__":
    main()
