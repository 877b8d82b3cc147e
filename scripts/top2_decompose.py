#!/usr/bin/env python3
"""Decompose the FP fast path at the FP3 shape: top2 kernel alone, the
fused gather, and the full interpolate."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.ops import pallas_knn
from pointstowood_tpu.model.pointconv import gather_rows

B, T, S, C = 8, 16384, 8192, 512

read = jax.jit(lambda a: jnp.asarray(a, jnp.float32).sum())


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(read(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    np.asarray(read(out[0] if isinstance(out, tuple) else out))
    print(f"{label:40s} {(time.perf_counter() - t0) / 10 * 1000:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(B, S, 3)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, S, C)).astype(np.float32),
                    dtype=jnp.bfloat16)

    t2 = jax.jit(jax.vmap(
        lambda qq, ss: pallas_knn.top2(qq, ss, jnp.sum(ss * ss, axis=1))
    ))
    vals, idx = bench(t2, q, s, label="top2 kernel (vmapped)")

    g = jax.jit(lambda xx, ii: gather_rows(
        jnp.concatenate([xx.astype(jnp.float32),
                         jnp.zeros_like(xx[..., :3], jnp.float32)], -1), ii))
    bench(g, x, idx, label="fused feats+pos gather (T,2,C+3)")


if __name__ == "__main__":
    main()
