"""Geometric priors and DTM normalization tests."""

import numpy as np
import pandas as pd

from pointstowood_tpu.tools.priors import geometric_priors
from pointstowood_tpu.tools.height_normalisation import normalise_height


def test_priors_line_vs_plane_vs_blob(rng):
    n = 200
    line = np.stack([np.linspace(0, 1, n), np.zeros(n), np.zeros(n)], 1)
    line += rng.normal(0, 1e-4, line.shape)
    plane = np.stack(
        [rng.uniform(0, 1, n), rng.uniform(0, 1, n), np.zeros(n)], 1
    )
    plane += rng.normal(0, 1e-4, plane.shape)
    blob = rng.normal(0, 0.3, size=(n, 3))
    pr_line = geometric_priors(line, k=16)
    pr_plane = geometric_priors(plane, k=16)
    pr_blob = geometric_priors(blob, k=16)
    # linear structures: linearity ~ 1; planar mid; isotropic blob lowest
    assert pr_line.mean() > 0.95
    assert pr_line.mean() > pr_plane.mean() > pr_blob.mean()
    assert np.isfinite(pr_line).all() and np.isfinite(pr_blob).all()
    assert 0.0 <= pr_blob.min() and pr_line.max() <= 1.0 + 1e-5


def test_priors_eigvals_match_lapack(rng):
    import jax.numpy as jnp
    from pointstowood_tpu.tools.priors import _eigvals_sym3x3

    a = rng.normal(size=(50, 3, 3))
    sym = (a + a.transpose(0, 2, 1)) / 2
    ours = np.asarray(_eigvals_sym3x3(jnp.asarray(sym, jnp.float32)))
    ref = np.linalg.eigvalsh(sym)[:, ::-1]  # descending
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)


def test_normalise_height_flat_ground(rng):
    n = 500
    ground = pd.DataFrame(
        {
            "x": rng.uniform(0, 10, n),
            "y": rng.uniform(0, 10, n),
            "z": 5.0 + rng.normal(0, 0.01, n),
            "label": np.full(n, 2.0),
        }
    )
    canopy = pd.DataFrame(
        {
            "x": rng.uniform(0, 10, n),
            "y": rng.uniform(0, 10, n),
            "z": rng.uniform(10, 20, n),
            "label": np.zeros(n),
        }
    )
    pc = pd.concat([ground, canopy], ignore_index=True)
    out = normalise_height(pc)
    nz = out["n_z"].to_numpy()
    np.testing.assert_allclose(nz[:n], 0.0, atol=0.05)  # ground ~ 0
    np.testing.assert_allclose(nz[n:], pc["z"].to_numpy()[n:] - 5.0, atol=0.05)


def test_normalise_height_infills_holes(rng):
    # ground only on one side; the other side in-fills from the median
    n = 300
    pc = pd.DataFrame(
        {
            "x": np.concatenate([rng.uniform(0, 5, n), rng.uniform(5, 10, n)]),
            "y": rng.uniform(0, 10, 2 * n),
            "z": np.concatenate([np.full(n, 2.0), rng.uniform(10, 12, n)]),
            "label": np.concatenate([np.full(n, 2.0), np.zeros(n)]),
        }
    )
    out = normalise_height(pc)
    assert np.isfinite(out["n_z"]).all()
    np.testing.assert_allclose(out["n_z"].to_numpy()[:n], 0.0, atol=0.05)
    assert (out["n_z"].to_numpy()[n:] > 7).all()
