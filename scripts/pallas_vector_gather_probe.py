#!/usr/bin/env python3
"""Pallas feasibility probe #2: Mosaic vectorized VMEM gather.

Round-1 probe (pallas_gather_probe.py) showed a fori_loop-of-dynamic-slices
gather runs at ~16 ns/row vs XLA's ~6 ns/row — per-row DMA overhead, not
bandwidth, is the wall. This probe asks whether Mosaic can lower a
*vectorized* take (table[idx] on a VMEM-resident value) to its native
dynamic-gather path, which would unlock a fused gather+message kernel.

Also probes the one-hot-matmul gather (MXU) for comparison at small table
sizes.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C, M, R = 16384, 128, 262144, 2048


def vector_gather_kernel(idx_ref, src_ref, out_ref):
    table = src_ref[:]          # (N, C) VMEM value
    idx = idx_ref[:]            # (R,) int32
    out_ref[:] = jnp.take(table, idx, axis=0)


@jax.jit
def pallas_vector_gather(src, idx):
    return pl.pallas_call(
        vector_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((M, C), src.dtype),
        grid=(M // R,),
        in_specs=[
            pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(idx, src)


def samesize_gather_kernel(idx_ref, src_ref, out_ref):
    # Mosaic rejected (R,) idx vs (N, C) table ("Shape mismatch in input,
    # indices and output") — probe the same-shape dynamic gather: block of
    # N indices from an N-row table.
    out_ref[:] = jnp.take(src_ref[:], idx_ref[:], axis=0)


@jax.jit
def pallas_samesize_gather(src, idx):
    return pl.pallas_call(
        samesize_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((M, C), src.dtype),
        grid=(M // N,),
        in_specs=[
            pl.BlockSpec((N,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(idx, src)


def taa_gather_kernel(idx_ref, src_ref, out_ref):
    idx2d = jnp.broadcast_to(idx_ref[:][:, None], (N, C))
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx2d, axis=0)


@jax.jit
def pallas_taa_gather(src, idx):
    return pl.pallas_call(
        taa_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((M, C), src.dtype),
        grid=(M // N,),
        in_specs=[
            pl.BlockSpec((N,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(idx, src)


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(M,)).astype(np.int32))
    read = jax.jit(lambda x: x.sum())
    ref = np.asarray(src)[np.asarray(idx)]

    for name, fn in [
        ("vector gather (R,) idx", pallas_vector_gather),
        ("same-size gather (N,) idx", pallas_samesize_gather),
        ("take_along_axis gather", pallas_taa_gather),
    ]:
        try:
            o = fn(src, idx)
            np.asarray(read(o))
            ok = np.array_equal(np.asarray(o), ref)
            t0 = time.perf_counter()
            for _ in range(10):
                o = fn(src, idx)
            np.asarray(read(o))
            dt = (time.perf_counter() - t0) / 10
            print(f"pallas {name}: correct={ok} {dt * 1000:.2f} ms "
                  f"({dt / M * 1e9:.1f} ns/row)")
        except Exception as e:
            print(f"pallas {name} FAILED: {type(e).__name__}: {str(e)[:300]}")

    xla = jax.jit(lambda s_, i_: s_[i_])
    o2 = xla(src, idx)
    np.asarray(read(o2))
    t0 = time.perf_counter()
    for _ in range(10):
        o2 = xla(src, idx)
    np.asarray(read(o2))
    dt = (time.perf_counter() - t0) / 10
    print(f"xla gather:           {dt * 1000:.2f} ms ({dt / M * 1e9:.1f} ns/row)")


if __name__ == "__main__":
    main()
