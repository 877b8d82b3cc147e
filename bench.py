#!/usr/bin/env python3
"""Benchmark: plot-scale inference throughput (points/sec/chip).

Runs the inference hot path — the padded-tile forward pass at the
reference's canonical config (max_pts=16384 tiles, batch_size=8,
reference README.md:73) — on the available accelerator and prints ONE JSON
line:

  {"metric": "inference_points_per_sec", "value": N, "unit": "points/s",
   "vs_baseline": R}

vs_baseline: the reference publishes no numbers (BASELINE.md); R is the
ratio against ESTIMATED_REFERENCE_PPS, a documented order-of-magnitude
estimate of the PyTorch/PyG reference on its RTX 6000 dev GPU
(batch 8 x 16384-pt tiles under AMP). Replace with a measured value when
the reference can be run.
"""

import json
import time

import numpy as np

# Order-of-magnitude estimate of the CUDA reference's per-point forward
# throughput on the RTX 6000 (no published numbers exist to cite; see
# BASELINE.md). The north-star target is >10x this on a v5e-8.
ESTIMATED_REFERENCE_PPS = 1.0e6

BATCH = 8
N = 16384
WARMUP = 2
ITERS = 8


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from pointstowood_tpu.model import Net

    rng = np.random.default_rng(141190)
    # Tree-like synthetic tile: trunk + crown, realistic spatial density.
    pts = []
    for _ in range(BATCH):
        n_wood, n_leaf = N // 4, N - N // 4
        theta = rng.uniform(0, 2 * np.pi, n_wood)
        r = rng.uniform(0, 0.15, n_wood)
        trunk = np.stack(
            [r * np.cos(theta), r * np.sin(theta), rng.uniform(0, 2, n_wood)], 1
        )
        crown = rng.normal(0, 0.7, size=(n_leaf, 3)) + [0, 0, 1.5]
        pts.append(np.concatenate([trunk, crown]).astype(np.float32))
    pos = np.stack(pts)
    pos -= pos.mean(axis=1, keepdims=True)
    refl = rng.normal(size=(BATCH, N)).astype(np.float32)
    mask = np.ones((BATCH, N), bool)
    sf = np.linalg.norm(pos, axis=2).max(axis=1).astype(np.float32)

    net = Net(dtype=jnp.bfloat16)
    pos_j, refl_j = jnp.asarray(pos), jnp.asarray(refl)
    mask_j, sf_j = jnp.asarray(mask), jnp.asarray(sf)
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, pos_j, refl_j, mask_j, sf_j
    )

    @jax.jit
    def forward(variables, pos, refl, mask, sf):
        logits = net.apply(variables, pos, refl, mask, sf, training=False)
        return jax.nn.sigmoid(jnp.nan_to_num(logits))

    # NOTE: block_until_ready is a no-op on this environment's tunneled TPU
    # backend; a host readback of a reduced scalar is the only true sync.
    reduce = jax.jit(lambda p: p.sum())
    for _ in range(WARMUP):
        np.asarray(reduce(forward(variables, pos_j, refl_j, mask_j, sf_j)))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        probs = forward(variables, pos_j, refl_j, mask_j, sf_j)
    np.asarray(reduce(probs))  # true device sync
    elapsed = time.perf_counter() - t0

    pts_per_sec = BATCH * N * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "inference_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / ESTIMATED_REFERENCE_PPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
