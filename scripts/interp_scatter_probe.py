#!/usr/bin/env python3
"""Two decision probes for the backward attack (round 3):

1. FP interpolation: gather-path vs fused-kernel cost, fwd and bwd
   separately, at the three canonical train FP shapes.
2. Gather-VJP scatter alternatives at the SA2/SA3/FP shapes:
     a. native XLA scatter-add (the current VJP)
     b. forward-hoisted sort: permutation gather + cumsum + boundary
        diff (the sort runs OUTSIDE the timed backward, as it would be
        computed in the forward where indices are gradient-free)
   Plus the standalone cost of the key sort itself (the forward-side
   price of (b)).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 5
read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:52s} {dt * 1000:8.2f} ms")
    return dt


def probe_interp():
    from pointstowood_tpu.ops import pallas_interp
    from pointstowood_tpu.ops.interpolate import knn_interpolate_batched

    print("== FP interpolation: gather vs fused ==")
    B, C = 8, 512
    for label, t, s in (("FP3", 4096, 2048), ("FP2", 8192, 4096),
                        ("FP1", 16384, 8192)):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, s, C)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        pos = jnp.asarray(rng.uniform(-1, 1, (B, s, 3)).astype(np.float32))
        tpos = jnp.asarray(rng.uniform(-1, 1, (B, t, 3)).astype(np.float32))
        smask = jnp.asarray(np.ones((B, s), bool))
        ct = jnp.asarray(rng.normal(size=(B, t, C)).astype(np.float32)
                         ).astype(jnp.bfloat16)

        # method='fast' without fused dispatch: monkeypatch supported off
        orig_sup = pallas_interp.fused_supported
        pallas_interp.fused_supported = lambda *a: False
        try:
            gf = jax.jit(lambda x: knn_interpolate_batched(
                x, pos, tpos, k=2, source_mask=smask, method="fast"))
            bench(gf, x, label=f"{label} gather fwd")
            ggrad = jax.jit(jax.grad(lambda x: jnp.sum(
                knn_interpolate_batched(
                    x, pos, tpos, k=2, source_mask=smask, method="fast"
                ).astype(jnp.float32) * ct.astype(jnp.float32))))
            bench(ggrad, x, label=f"{label} gather fwd+bwd")
        finally:
            pallas_interp.fused_supported = orig_sup

        ff = jax.jit(lambda x: pallas_interp.fp_interpolate_fast(
            x, pos, tpos, smask))
        bench(ff, x, label=f"{label} fused fwd")
        fgrad = jax.jit(jax.grad(lambda x: jnp.sum(
            pallas_interp.fp_interpolate_fast(
                x, pos, tpos, smask).astype(jnp.float32)
            * ct.astype(jnp.float32))))
        bench(fgrad, x, label=f"{label} fused fwd+bwd")


def probe_scatter():
    print("\n== gather-VJP scatter alternatives ==")
    for label, B, e, n, c in (
        ("SA2", 8, 131072, 8192, 132),
        ("SA3", 8, 65536, 4096, 260),
        ("FP1k2", 8, 32768, 8192, 515),
    ):
        rng = np.random.default_rng(1)
        idx = jnp.asarray(
            rng.integers(0, n, size=(B, e)).astype(np.int32))
        ct = jnp.asarray(rng.normal(size=(B, e, c)).astype(np.float32))

        @jax.jit
        def native(idx, ct):
            return jnp.zeros((B, n, c), ct.dtype).at[
                jnp.arange(B, dtype=jnp.int32)[:, None], idx
            ].add(ct)

        @jax.jit
        def make_perm(idx):
            # forward-side work: sort keys once, derive boundaries
            sidx, perm = jax.lax.sort_key_val(
                idx, jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))
            # boundary[b, t] = first position with sidx >= t, via
            # searchsorted per batch row
            bounds = jax.vmap(
                lambda s: jnp.searchsorted(s, jnp.arange(n + 1))
            )(sidx)
            return perm, bounds.astype(jnp.int32)

        @jax.jit
        def sorted_cumsum(perm, bounds, ct):
            from pointstowood_tpu.model.pointconv import gather_rows
            ctp = gather_rows(ct, perm)             # (B, e, c) permuted
            cs = jnp.cumsum(ctp, axis=1)            # inclusive prefix
            z = jnp.zeros((B, 1, c), ct.dtype)
            cs = jnp.concatenate([z, cs], axis=1)   # (B, e+1, c)
            lo = gather_rows(cs, bounds[:, :-1])
            hi = gather_rows(cs, bounds[:, 1:])
            return hi - lo

        t_n = bench(native, idx, ct, label=f"{label} native scatter-add")
        perm, bounds = make_perm(idx)
        np.asarray(read(perm))
        t_s = bench(sorted_cumsum, perm, bounds, ct,
                    label=f"{label} perm+cumsum+diff (bwd cost)")
        bench(make_perm, idx, label=f"{label} key sort+bounds (fwd cost)")
        # correctness
        a = np.asarray(native(idx, ct))
        b = np.asarray(sorted_cumsum(perm, bounds, ct))
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        print(f"{label} max rel err vs native: {err:.2e}   "
              f"speedup {t_n / t_s:.2f}x")


def main():
    probe_interp()
    probe_scatter()


if __name__ == "__main__":
    main()
