#!/usr/bin/env python3
"""A/B the folded top-2 kernel at the FP1/FP2 eval shapes.

Variants over (query_block, chunk, passes):
  * baseline: QB=256, halves (chunk = n/2), bf16x3  (shipped kernel)
  * QB=512 / chunk 2048: live fp32 tiles shrink from (QB, n/2) to
    (QB, 2048), so the larger query block fits the 16 MB scoped-VMEM
    budget and halves the grid-step count.
  * QB=1024 / chunk 1024
  * passes=1 (single bf16 MXU pass, DEFAULT precision) to isolate how
    much of the kernel is matmul passes vs per-step overhead. NOT a
    shipping candidate (bf16 product noise ~|q||s|/512 misranks
    near-ties at tile extents).

Run on the real chip: python scripts/top2_variants_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOP2_GROUPS = 256
_SLOT2_BITS = 6
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
    print(f"{label:52s} {dt * 1000:8.2f} ms", flush=True)
    return out


def _make_kernel(n, chunk, passes):
    n_chunks = n // chunk
    slices_per_chunk = chunk // TOP2_GROUPS

    def kernel(q_ref, st_ref, pen_ref, vals_ref, idx_ref):
        qb = q_ref[:]
        big = 3.0e38
        m = None
        for ci in range(n_chunks):
            lo = ci * chunk
            sth = st_ref[:, lo : lo + chunk]

            def dot(a, b, prec=jax.lax.Precision.DEFAULT):
                return jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )

            if passes == 3:
                ah = qb.astype(jnp.bfloat16)
                al = (qb - ah.astype(jnp.float32)).astype(jnp.bfloat16)
                bh = sth.astype(jnp.bfloat16)
                bl = (sth - bh.astype(jnp.float32)).astype(jnp.bfloat16)
                d = dot(ah, bh) + (dot(ah, bl) + dot(al, bh))
            else:
                d = dot(qb, sth)
            d = d + pen_ref[:, lo : lo + chunk]
            d = jnp.minimum(d, big)
            for a in range(slices_per_chunk):
                slot = ci * slices_per_chunk + a
                sl = jax.lax.bitcast_convert_type(
                    d[:, a * TOP2_GROUPS : (a + 1) * TOP2_GROUPS],
                    jnp.uint32,
                )
                # same shift pair as the shipped kernel (a 0xFFFFFFC0
                # literal overflows the int32 scalar path, and jnp-array
                # masks are captured constants pallas rejects)
                sl = (sl >> _SLOT2_BITS) << _SLOT2_BITS
                if slot:
                    sl = sl | slot
                p = jax.lax.bitcast_convert_type(sl, jnp.float32)
                m = p if m is None else jnp.minimum(m, p)

        iota = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
        v1 = jnp.min(m, axis=1, keepdims=True)
        j1 = jnp.min(jnp.where(m <= v1, iota, n), axis=1, keepdims=True)
        m2 = jnp.where(iota == j1, big, m)
        v2 = jnp.min(m2, axis=1, keepdims=True)
        j2 = jnp.min(jnp.where(m2 <= v2, iota, n), axis=1, keepdims=True)

        def unpack(v, j):
            b = jax.lax.bitcast_convert_type(v, jnp.uint32)
            slot = (b & ((1 << _SLOT2_BITS) - 1)).astype(jnp.int32)
            return slot * TOP2_GROUPS + j

        vals_ref[:] = jnp.concatenate([v1, v2], axis=1)
        idx_ref[:] = jnp.concatenate([unpack(v1, j1), unpack(v2, j2)],
                                     axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("qb", "chunk", "passes"))
def top2_variant(q, s, penalty, qb=512, chunk=2048, passes=3):
    n = s.shape[0]
    q_n = q.shape[0]
    q4 = jnp.concatenate([q, jnp.zeros((q_n, 1), jnp.float32)], axis=1)
    st = jnp.concatenate(
        [(-2.0) * s.T, jnp.ones((1, n), jnp.float32)], axis=0
    )
    pen = penalty[None, :]
    interpret = jax.devices()[0].platform == "cpu"
    vals, idx = pl.pallas_call(
        _make_kernel(n, chunk, passes),
        out_shape=(
            jax.ShapeDtypeStruct((q_n, 2), jnp.float32),
            jax.ShapeDtypeStruct((q_n, 2), jnp.int32),
        ),
        grid=(q_n // qb,),
        in_specs=[
            pl.BlockSpec((qb, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qb, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q4, st, pen)
    return vals, idx


def main():
    from pointstowood_tpu.ops import pallas_knn

    rng = np.random.default_rng(0)
    for (t, s_n, tag) in ((16384, 8192, "FP1"), (8192, 4096, "FP2")):
        q = jnp.asarray(rng.normal(size=(B, t, 3)).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(B, s_n, 3)).astype(np.float32))
        print(f"--- {tag}: T={t} S={s_n} (vmapped B={B}) ---", flush=True)

        base = jax.jit(jax.vmap(
            lambda qq, ss: pallas_knn.top2(qq, ss, jnp.sum(ss * ss, axis=1))
        ))
        _, idx_ref = bench(base, q, s, label="shipped top2 (QB=256, halves)")

        for qb, chunk, passes in (
            (512, 2048, 3),
            (1024, 1024, 3),
            (512, 1024, 3),
            (256, 2048, 3),
            (512, 2048, 1),
        ):
            fn = jax.jit(jax.vmap(
                lambda qq, ss: top2_variant(
                    qq, ss, jnp.sum(ss * ss, axis=1),
                    qb=qb, chunk=chunk, passes=passes)
            ))
            _, idx_v = bench(
                fn, q, s,
                label=f"variant qb={qb} chunk={chunk} passes={passes}")
            if passes == 3:
                agree = float(
                    (np.asarray(idx_v) == np.asarray(idx_ref)).mean())
                print(f"    idx agreement vs shipped: {agree:.5f}",
                      flush=True)


if __name__ == "__main__":
    main()
