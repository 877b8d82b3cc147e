#!/usr/bin/env python3
"""Forward throughput per bucket shape at CONSTANT points per dispatch
(the scaled-batch eval shapes): is the per-point cost flat across caps,
or do small caps pay amk row overhead / dispatch overhead that erases
their cheaper O(N)-per-point kNN?

Usage: python scripts/bucket_forward_probe.py  (real TPU, ~4 min warm)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.model import Net

SHAPES = [(512, 256), (256, 512), (128, 1024), (64, 2048), (32, 4096),
          (16, 8192), (8, 16384)]
ITERS = 6


def main():
    net = Net(dtype=jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=())
    def forward(variables, pos, refl, mask, sf):
        return jax.nn.sigmoid(jnp.nan_to_num(
            net.apply(variables, pos, refl, mask, sf, training=False)))

    reduce = jax.jit(lambda p: p.sum())
    rng = np.random.default_rng(3)
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, jnp.zeros((1, 256, 3)),
        jnp.zeros((1, 256)), jnp.ones((1, 256), bool), jnp.ones((1,)))

    for b, cap in SHAPES:
        pts = rng.normal(0, 1.0, (b, cap, 3)).astype(np.float32)
        pos = jnp.asarray(pts)
        refl = jnp.asarray(rng.normal(size=(b, cap)).astype(np.float32))
        mask = jnp.ones((b, cap), bool)
        sf = jnp.ones((b,), jnp.float32)
        t0 = time.perf_counter()
        np.asarray(reduce(forward(variables, pos, refl, mask, sf)))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = forward(variables, pos, refl, mask, sf)
        np.asarray(reduce(out))
        dt = (time.perf_counter() - t0) / ITERS
        pps = b * cap / dt
        print(f"({b:4d}, {cap:5d}): {dt * 1e3:7.2f} ms/dispatch "
              f"{pps / 1e6:6.2f}M pts/s  (compile+first {t_compile:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
