#!/usr/bin/env python3
"""A/B the full forward at the canonical shape across kNN methods."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B, N = 8, 16384
ITERS = 10

read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def main():
    from pointstowood_tpu.model import Net

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    refl = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    sf = jnp.asarray(np.linalg.norm(pos, axis=2).max(axis=1).astype(np.float32))

    for spec in sys.argv[1:] or ("fast@0.9", "approx@0.95"):
        method, _, r = spec.partition("@")
        net = Net(dtype=jnp.bfloat16, knn_method=method,
                  knn_recall=float(r) if r else 0.95)
        variables = jax.jit(functools.partial(net.init, training=False))(
            {"params": jax.random.key(0)}, pos, refl, mask, sf
        )
        fwd = jax.jit(functools.partial(net.apply, training=False))
        np.asarray(read(fwd(variables, pos, refl, mask, sf)))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fwd(variables, pos, refl, mask, sf)
        np.asarray(read(out))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{spec:14s} {dt * 1000:8.2f} ms  {B * N / dt:,.0f} pts/s")


if __name__ == "__main__":
    main()
