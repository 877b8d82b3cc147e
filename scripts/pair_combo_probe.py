#!/usr/bin/env python3
"""Per-combo device cost of the fused pair kernel at fixed stack height,
run in BOTH combo orders — separates a genuine small-union kernel
pathology from a loop-start / first-dispatch artifact (the fusion traces
always had (2048,2048) sorted first AND most expensive).

Usage: python scripts/pair_combo_probe.py  (real TPU, ~2 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from pointstowood_tpu.predict import tpu_fusion as tf

H = 64          # stack height (entries per dispatch)
REPS = 3
COMBOS = [(2048, 2048), (2048, 16384), (4096, 4096), (8192, 8192),
          (16384, 16384)]


def main():
    rng = np.random.default_rng(5)
    mp = 200_000
    all_q = jnp.asarray(rng.normal(size=(mp + tf.PAIR_QCHUNK, 3))
                        .astype(np.float32))
    probs = jnp.asarray(rng.uniform(0, 1, mp + tf.PAIR_QCHUNK)
                        .astype(np.float32))
    nsp = 1 << 20

    def run(cap_f, cap_c):
        qoffs = rng.integers(0, mp - tf.PAIR_QCHUNK, H).astype(np.int32)
        qlens = np.full(H, tf.PAIR_QCHUNK, np.int32)
        offf = rng.integers(0, mp - cap_f, H).astype(np.int32)
        lenf = np.full(H, cap_f, np.int32)
        offc = rng.integers(0, mp - cap_c, H).astype(np.int32)
        lenc = np.full(H, cap_c, np.int32)
        acc = jnp.zeros(nsp, jnp.uint16)
        acc = tf._fused_pair_knn(
            acc, all_q, probs, np.int32(0), qoffs, qlens, offf, lenf,
            offc, lenc, jnp.float32(0.5), jnp.float32(1.0), 64, True,
            int(cap_f), int(cap_c))
        np.asarray(acc[:8])  # sync

    # compile + first-execute every variant up front
    t0 = time.perf_counter()
    for c in COMBOS:
        run(*c)
    print(f"warm (compile+first-exec) {time.perf_counter() - t0:.1f}s")

    for order, label in ((COMBOS, "ascending"),
                         (COMBOS[::-1], "descending")):
        print(f"-- {label} --")
        for cap_f, cap_c in order:
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                run(cap_f, cap_c)
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            print(f"  ({cap_f:5d},{cap_c:5d}): best {best * 1e3:7.1f} ms "
                  f"({best / H * 1e3:5.2f} ms/entry) all "
                  f"{[round(t * 1e3) for t in ts]}")


if __name__ == "__main__":
    main()
