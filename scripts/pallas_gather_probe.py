#!/usr/bin/env python3
"""Pallas feasibility probe: VMEM-resident row gather vs XLA's gather.

Result (v5e, 262144 rows x 128 f32 from a 16384-row VMEM-resident table):
Pallas fori_loop-of-dynamic-slices 4.26 ms vs XLA flat gather 3.57 ms.
Row gathers on TPU are bound by small-row DMA (~6 ns/row regardless of
width); a custom kernel does not beat XLA's lowering, so the framework
keeps the flat XLA gather (see pointconv.gather_rows). Kept as the
starting point for a future fused gather+message kernel (the win would
come from never writing the gathered block to HBM, not from the gather
itself). Mosaic note: SMEM int32 blocks must align to 1024 elements.
"""

import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C, M, R = 16384, 128, 262144, 1024

def kernel(idx_ref, src_ref, out_ref):
    def body(r, _):
        i = idx_ref[r]
        out_ref[pl.ds(r, 1), :] = src_ref[pl.ds(i, 1), :]
        return 0
    jax.lax.fori_loop(0, R, body, 0)

@jax.jit
def pallas_gather(src, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, C), src.dtype),
        grid=(M // R,),
        in_specs=[
            pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((N, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(idx, src)

rng = np.random.default_rng(0)
src = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, size=(M,)).astype(np.int32))
read = jax.jit(lambda x: x.sum())

o = pallas_gather(src, idx); s = np.asarray(read(o))
ref = np.asarray(src)[np.asarray(idx)]
print("correct:", np.array_equal(np.asarray(o), ref))
t0 = time.perf_counter()
for _ in range(10): o = pallas_gather(src, idx)
np.asarray(read(o))
print(f"pallas gather: {(time.perf_counter()-t0)/10*1000:.2f} ms")

xla = jax.jit(lambda s_, i_: s_[i_])
o2 = xla(src, idx); np.asarray(read(o2))
t0 = time.perf_counter()
for _ in range(10): o2 = xla(src, idx)
np.asarray(read(o2))
print(f"xla gather:    {(time.perf_counter()-t0)/10*1000:.2f} ms")
