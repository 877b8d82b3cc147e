"""Geometric priors: eigen-feature (linearity/planarity) per point.

Rebuilds the archived prior computation
(reference: pointstowood/archive/prior_gpu.py:56-85): per point, take the
k nearest neighbors, form the 3x3 neighborhood covariance, compute its
eigenvalue ratios, and output max(linearity, planarity) — a wood-ness
geometric prior. The reference threads numpy blocks over a CPU pool; here
the whole computation is one jitted JAX program (covariances via einsum on
the MXU, closed-form symmetric 3x3 eigenvalues on the VPU — no LAPACK),
processed in fixed-size chunks, with neighbor indices from the native grid
kNN on the host.

Run: python -m pointstowood_tpu.tools.priors cloud.ply --k 128
"""

from __future__ import annotations

import argparse
import functools

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _eigvals_sym3x3(cov):
    """Eigenvalues (descending) of symmetric (..., 3, 3) matrices, closed
    form (no LAPACK — runs on TPU)."""
    a = cov
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    a_q = a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(a_q * a_q, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    det = jnp.linalg.det(a_q / p[..., None, None])
    r = jnp.clip(det / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    return jnp.stack([e1, e2, e3], axis=-1)


@functools.partial(jax.jit)
def _prior_chunk(nbr_xyz):
    """(n, k, 3) neighbor coordinates -> (n,) max(linearity, planarity).

    Matches prior_gpu.py:67-77 including its quirks: ratios NaN -> 0,
    linearity/planarity NaN-or-zero -> 0.5."""
    centered = nbr_xyz - jnp.mean(nbr_xyz, axis=1, keepdims=True)
    k = nbr_xyz.shape[1]
    cov = jnp.einsum(
        "ijk,ijl->ikl", centered, centered,
        precision=jax.lax.Precision.HIGHEST,
    ) / k
    evals = _eigvals_sym3x3(cov)
    ratios = evals / jnp.sum(evals, axis=1, keepdims=True)
    ratios = jnp.where(jnp.isnan(ratios), 0.0, ratios)
    lin = (ratios[:, 0] - ratios[:, 1]) / ratios[:, 0]
    lin = jnp.where(jnp.isnan(lin) | (lin == 0), 0.5, lin)
    pla = (ratios[:, 1] - ratios[:, 2]) / ratios[:, 0]
    pla = jnp.where(jnp.isnan(pla) | (pla == 0), 0.5, pla)
    return jnp.maximum(lin, pla)


def geometric_priors(xyz: np.ndarray, k: int = 128, chunk: int = 1 << 17,
                     indices: np.ndarray | None = None) -> np.ndarray:
    """max(linearity, planarity) per point over its k-neighborhood."""
    from pointstowood_tpu.predict.fusion import knn_indices

    xyz = np.asarray(xyz, dtype=np.float64)
    k = min(k, xyz.shape[0])
    if indices is None:
        indices = knn_indices(xyz, xyz, k)
    out = np.zeros(xyz.shape[0], np.float32)
    xyz32 = xyz.astype(np.float32)
    n = xyz.shape[0]
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        idx = indices[start:end, :k]
        pad = chunk - (end - start)
        nbr = xyz32[idx]
        if pad:
            nbr = np.concatenate([nbr, np.zeros((pad, k, 3), np.float32)])
        out[start:end] = np.asarray(_prior_chunk(jnp.asarray(nbr)))[: end - start]
    return out


def main(argv=None):
    from pointstowood_tpu.io import load_file, save_file

    p = argparse.ArgumentParser()
    p.add_argument("point_cloud")
    p.add_argument("--k", type=int, default=128)
    args = p.parse_args(argv)
    pc = load_file(args.point_cloud)
    pc["prior"] = geometric_priors(pc[["x", "y", "z"]].to_numpy(), k=args.k)
    out = args.point_cloud.replace(".ply", "_prior.ply")
    save_file(out, pc,
              additional_fields=[c for c in pc.columns if c not in ("x", "y", "z")])
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
