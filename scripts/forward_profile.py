#!/usr/bin/env python3
"""Decompose the canonical forward pass (B=8, N=16384, C=32) into its
component costs on the real chip: per-stage kNN, per-stage neighbor
gathers, FP interpolation, and the full network. Timings sync via host
readback of a reduced scalar (block_until_ready is a no-op here).

Output feeds BASELINE.md and the Pallas go/no-go decisions (VERDICT
round-1 items 4/5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B, N, C, K = 8, 16384, 32, 32
ITERS = 10

read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def sync(x):
    np.asarray(read(x))


def bench(fn, *args, iters=ITERS, label=""):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:48s} {dt * 1000:8.2f} ms")
    return dt


def main():
    from pointstowood_tpu.model import Net
    from pointstowood_tpu.model.pointconv import gather_rows
    from pointstowood_tpu.ops.interpolate import knn_interpolate_batched
    from pointstowood_tpu.ops.knn import knn_masked

    method = sys.argv[1] if len(sys.argv) > 1 else "fast"
    recall = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    print(f"knn method={method} recall_target={recall}")

    rng = np.random.default_rng(0)
    pos = rng.normal(size=(B, N, 3)).astype(np.float32)
    refl = rng.normal(size=(B, N)).astype(np.float32)
    mask = np.ones((B, N), bool)
    sf = np.linalg.norm(pos, axis=2).max(axis=1).astype(np.float32)
    pos_j = jnp.asarray(pos)
    refl_j = jnp.asarray(refl)
    mask_j = jnp.asarray(mask)
    sf_j = jnp.asarray(sf)

    import functools

    net = Net(dtype=jnp.bfloat16, knn_method=method, knn_recall=recall)
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, pos_j, refl_j, mask_j, sf_j
    )
    fwd = jax.jit(functools.partial(net.apply, training=False))
    total = bench(fwd, variables, pos_j, refl_j, mask_j, sf_j,
                  label=f"full forward ({B}x{N})")
    print(f"{'-> points/s':48s} {B * N / total:,.0f}")

    # per-stage kNN at the real stage shapes (centers query the previous
    # stage's points)
    stage_shapes = [(N, N // 2), (N // 2, N // 4), (N // 4, N // 8)]
    knn_total = 0.0
    for i, (n_src, n_q) in enumerate(stage_shapes):
        src = jnp.asarray(rng.normal(size=(n_src, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(n_q, 3)).astype(np.float32))

        knn_b = jax.jit(jax.vmap(
            lambda qq, ss: knn_masked(qq, ss, k=K, method=method,
                                      recall_target=recall,
                                      with_dist=False)[0]
        ))
        qb = jnp.broadcast_to(q, (B,) + q.shape)
        sb = jnp.broadcast_to(src, (B,) + src.shape)
        knn_total += bench(knn_b, qb, sb, label=f"SA{i+1} kNN ({n_q}x{n_src})")

    # FP interpolation kNN+gather at stage shapes (k=2)
    fp_total = 0.0
    for i, (n_tgt, n_src) in enumerate([(N, N // 2), (N // 2, N // 4), (N // 4, N // 8)]):
        x = jnp.asarray(rng.normal(size=(B, n_src, C * 16)).astype(np.float32),
                        dtype=jnp.bfloat16)
        ps = jnp.asarray(rng.normal(size=(B, n_src, 3)).astype(np.float32))
        pt = jnp.asarray(rng.normal(size=(B, n_tgt, 3)).astype(np.float32))
        interp = jax.jit(functools.partial(knn_interpolate_batched, k=2))
        fp_total += bench(interp, x, ps, pt, label=f"FP{3-i} interpolate ({n_tgt}<-{n_src})")

    # neighbor gathers at stage shapes (the dominant op per CLAUDE.md)
    gather_total = 0.0
    for i, (n_src, n_q) in enumerate(stage_shapes):
        width = [C + 4, C * 4 + 4, C * 8 + 4][i]
        tbl = jnp.asarray(rng.normal(size=(B, n_src, width)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, n_src, size=(B, n_q, K)).astype(np.int32))
        g = jax.jit(gather_rows)
        gather_total += bench(g, tbl, idx,
                              label=f"SA{i+1} nbr gather ({n_q}x{K}x{width})")

    print(f"\n{'sum: kNN':48s} {knn_total * 1000:8.2f} ms")
    print(f"{'sum: FP interpolate':48s} {fp_total * 1000:8.2f} ms")
    print(f"{'sum: SA gathers':48s} {gather_total * 1000:8.2f} ms")
    print(f"{'residual (MLPs/BN/max/misc)':48s} "
          f"{(total - knn_total - fp_total - gather_total) * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
