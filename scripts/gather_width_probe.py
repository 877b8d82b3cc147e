#!/usr/bin/env python3
"""Do wide-row gathers/scatters scale with BYTES on this TPU?

The round-1 note "row gathers are ~6 ns/row regardless of width" was
measured at widths <= ~132 fp32. The FP1 fused gather (515 fp32
channels) measures 53 ns/row (39 GB/s effective) — so beyond some width
the gather is byte-limited at well below HBM bandwidth. If halving bytes
(bf16) halves time, the fused gathers should carry features in bf16 with
positions as exact bf16 hi/lo channel pairs, and the scatter-add VJPs
should accumulate in bf16.

Shapes: FP1 gather (262k rows x 515 ch), SA1 (2M x 36), SA2 (1M x 132),
SA3 (0.5M x 260), plus the matching scatter-adds.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.model.pointconv import gather_rows

B = 8
read = jax.jit(lambda a: jnp.asarray(a, jnp.float32).sum())


def bench(fn, *args, label=""):
    out = fn(*args)
    np.asarray(read(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    np.asarray(read(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / 10
    rows = args[1].size
    byt = rows * (
        (args[0].shape[-1]) * args[0].dtype.itemsize
    )
    print(f"{label:44s} {dt * 1000:8.2f} ms  "
          f"{dt / rows * 1e9:6.1f} ns/row  "
          f"{byt / dt / 1e9:6.1f} GB/s", flush=True)
    return dt


def scatter_bench(n, ct, idx, label=""):
    def fn(ctf, idxf):
        return jnp.zeros((B, n, ct.shape[-1]), ct.dtype).at[
            jnp.arange(B, dtype=jnp.int32)[:, None], idxf
        ].add(ctf)

    jfn = jax.jit(fn)
    out = jfn(ct, idx)
    np.asarray(read(out))
    t0 = time.perf_counter()
    for _ in range(10):
        out = jfn(ct, idx)
    np.asarray(read(out))
    dt = (time.perf_counter() - t0) / 10
    rows = idx.size
    print(f"{label:44s} {dt * 1000:8.2f} ms  "
          f"{dt / rows * 1e9:6.1f} ns/row", flush=True)
    return dt


def main():
    # All operands are generated ON DEVICE: the tunneled link moves
    # ~10 MB/s, so host uploads of 100+ MB operands would dominate (and
    # time out) the probe.
    cases = [
        ("FP1", 8192, 16384 * 2, 512),
        ("SA1", 16384, 8192 * 32, 32),
        ("SA2", 8192, 4096 * 32, 128),
        ("SA3", 4096, 2048 * 32, 256),
    ]
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames=("n", "e", "c"))
    def make(key, n, e, c):
        k1, k2, k3 = jax.random.split(key, 3)
        xf = jax.random.normal(k1, (B, n, c + 4), jnp.float32)
        xb8 = jax.random.normal(k2, (B, n, c + 8), jnp.bfloat16)
        idx = jax.random.randint(k3, (B, e), 0, n, jnp.int32)
        ctf = jax.random.normal(k1, (B, e, c + 4), jnp.float32)
        return xf, xb8, idx, ctf

    for tag, n, e, c in cases:
        xf, xb8, idx, ctf = make(key, n=n, e=e, c=c)
        xb = xf.astype(jnp.bfloat16)
        pos = xf[..., :4]
        print(f"--- {tag}: n={n} rows={B * e / 1e6:.2f}M width={c}+4 ---",
              flush=True)
        g = jax.jit(lambda a, i: gather_rows(a, i))
        bench(g, xf, idx, label="fused gather fp32 (shipped)")
        bench(g, xb, idx, label="gather bf16 same-width")
        bench(g, xb8, idx, label="gather bf16 +hi/lo pos (c+8)")
        bench(g, pos, idx, label="gather fp32 pos-only (4ch)")

        scatter_bench(n, ctf, idx, label="scatter-add fp32 (shipped VJP)")
        scatter_bench(n, ctf.astype(jnp.bfloat16), idx,
                      label="scatter-add bf16")
        scatter_bench(n, ctf[..., : c], idx,
                      label="scatter-add fp32 feats-only")
        scatter_bench(n, ctf[..., : c].astype(jnp.bfloat16), idx,
                      label="scatter-add bf16 feats-only")


if __name__ == "__main__":
    main()
