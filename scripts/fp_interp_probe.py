#!/usr/bin/env python3
"""A/B the FP interpolation op (k=2) at the FP3 shape: approx vs the
exact in-kernel top-2 fast path."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.ops.interpolate import knn_interpolate_batched

B, T, S, C = 8, 16384, 8192, 512

read = jax.jit(lambda a: jnp.asarray(a, jnp.float32).sum())


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, C)).astype(np.float32),
                    dtype=jnp.bfloat16)
    ps = jnp.asarray(rng.normal(size=(B, S, 3)).astype(np.float32))
    pt = jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32))
    for method in sys.argv[1:] or ("approx", "fast"):
        fn = jax.jit(functools.partial(knn_interpolate_batched, k=2,
                                       method=method))
        np.asarray(read(fn(x, ps, pt)))
        t0 = time.perf_counter()
        for _ in range(10):
            o = fn(x, ps, pt)
        np.asarray(read(o))
        print(f"FP3 interp {method}: "
              f"{(time.perf_counter() - t0) / 10 * 1000:.2f} ms")


if __name__ == "__main__":
    main()
