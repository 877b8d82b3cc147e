"""Pallas scatter-add as a blocked one-hot matmul.

The training-step backward is dominated by the VJPs of the neighbor
gathers: XLA lowers them to native scatter-adds that are per-ROW bound
(~13-20 ns/row regardless of width — BASELINE.md round-3 trace), e.g.
17.4 ms for SA2's 8x65536 rows. A sort+segment-sum reformulation
measured 3x slower (round-3 negative). This kernel takes the third
route: reformulate scatter-add as matmuls so the rows ride the MXU.

    out[j] = sum_{e : idx[e] == j} g[e]      ==      out = onehot^T @ g

materialized BLOCKWISE in VMEM (never in HBM): for each (row-block,
edge-block) grid step, build the (BN, BE) one-hot by comparing the edge
indices against the block's row iota, and accumulate
``dot(onehot, g_block)`` into the revisited (BN, C) output block in
fp32. Total work is N_rows x E compares (VPU) + N_rows x E x C MACs
(MXU) — for the conv shapes (E ~ 8 N, C >= 64) the MXU finishes rows
~2x faster than the serial scatter walks them.

The reference hits the same problem inside torch-scatter's CUDA
atomic-add kernels (reference: pointstowood/src/pointnet.py:122 backward);
atomics don't exist on the TPU vector unit, which is why the one-hot
matmul — the standard TPU trick for data-dependent reductions — is the
native formulation here.

Numerics: the one-hot matrix is EXACT in bf16 (0.0/1.0), g is consumed
in its own dtype, accumulation is fp32 (preferred_element_type), so the
result is at least as accurate as XLA's scatter-add in bf16 and matches
fp32 scatter-add to accumulation-order differences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block sizes: (BN, BE) bf16 one-hot = 1 MB in VMEM; the (BN, C) fp32
# accumulator block revisits across the edge grid dimension.
ROW_BLOCK = 1024
EDGE_BLOCK = 1024


def _kernel(idx_ref, g_ref, out_ref):
    jb = pl.program_id(1)
    eb = pl.program_id(2)

    @pl.when(eb == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jb * ROW_BLOCK + jax.lax.broadcasted_iota(
        jnp.int32, (ROW_BLOCK, EDGE_BLOCK), 0
    )
    onehot = (rows == idx_ref[0]).astype(jnp.bfloat16)  # (BN, BE)
    out_ref[0] += jax.lax.dot_general(
        onehot, g_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("n_rows",))
def scatter_add_rows(g: jax.Array, idx: jax.Array, n_rows: int):
    """Batched scatter-add: out[b, j] = sum over e with idx[b, e] == j of
    g[b, e]. g (B, E, C), idx (B, E) int32 in [0, n_rows) (out-of-range
    indices are silently dropped — matching XLA scatter's drop mode).
    Returns (B, n_rows, C) in g.dtype.

    Shape constraints: E % EDGE_BLOCK == 0, n_rows % ROW_BLOCK == 0 and
    C padded to the lane width by the caller for peak throughput (any C
    works; Mosaic pads internally).
    """
    b, e, c = g.shape
    assert e % EDGE_BLOCK == 0 and n_rows % ROW_BLOCK == 0, (e, n_rows)
    interpret = jax.devices()[0].platform == "cpu"
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_rows, c), jnp.float32),
        grid=(b, n_rows // ROW_BLOCK, e // EDGE_BLOCK),
        in_specs=[
            pl.BlockSpec((1, 1, EDGE_BLOCK), lambda bi, j, k: (bi, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EDGE_BLOCK, c), lambda bi, j, k: (bi, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROW_BLOCK, c), lambda bi, j, k: (bi, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None, :], g)
    return out.astype(g.dtype)


def supported(e: int, n_rows: int) -> bool:
    return e % EDGE_BLOCK == 0 and n_rows % ROW_BLOCK == 0
