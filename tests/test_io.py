"""I/O round-trip and column-canonicalization tests."""

import numpy as np
import pandas as pd
import pytest

from pointstowood_tpu.io import load_file, read_ply, save_file, write_ply
from pointstowood_tpu.io.pcd import read_pcd, write_pcd
from pointstowood_tpu.io.loader import canonicalize_columns


def _cloud(n=100, rng=None, **extra):
    rng = rng or np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "x": rng.normal(size=n) * 10,
            "y": rng.normal(size=n) * 10,
            "z": rng.uniform(0, 30, size=n),
        }
    )
    for k, v in extra.items():
        df[k] = v
    return df


def test_ply_roundtrip_binary(tmp_path, rng):
    df = _cloud(256, rng, reflectance=rng.normal(size=256), label=np.ones(256))
    p = str(tmp_path / "c.ply")
    write_ply(p, df)
    back = read_ply(p)
    assert list(back.columns) == ["x", "y", "z", "reflectance", "label"]
    np.testing.assert_allclose(back.to_numpy(), df.to_numpy(), rtol=0, atol=0)


def test_ply_roundtrip_rgb(tmp_path, rng):
    df = _cloud(64, rng, red=np.arange(64), green=np.arange(64), blue=np.arange(64))
    p = str(tmp_path / "rgb.ply")
    write_ply(p, df)
    back = read_ply(p)
    assert list(back.columns) == ["x", "y", "z", "red", "green", "blue"]
    assert back["red"].dtype == np.int32
    np.testing.assert_array_equal(back["blue"].to_numpy(), np.arange(64))


def test_ply_ascii_read(tmp_path):
    p = str(tmp_path / "a.ply")
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n1 2 3\n4 5 6\n7 8 9\n"
        )
    df = read_ply(p)
    assert df.shape == (3, 3)
    np.testing.assert_allclose(df["z"].to_numpy(), [3, 6, 9])


def test_ply_rejects_mesh(tmp_path):
    p = str(tmp_path / "m.ply")
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 1\nproperty float x\n"
            "property float y\nproperty float z\nelement face 1\n"
            "property list uchar int vertex_indices\nend_header\n0 0 0\n3 0 0 0\n"
        )
    with pytest.raises(ValueError, match="mesh"):
        read_ply(p)


def test_pcd_roundtrip_binary(tmp_path, rng):
    df = _cloud(128, rng, intensity=rng.uniform(size=128).astype(np.float32))
    p = str(tmp_path / "c.pcd")
    write_pcd(df, p, binary=True)
    back = read_pcd(p)
    assert list(back.columns) == ["x", "y", "z", "intensity"]
    np.testing.assert_allclose(
        back.to_numpy(), df[["x", "y", "z", "intensity"]].to_numpy().astype(np.float32),
        rtol=1e-6,
    )


def test_load_save_roundtrip(tmp_path, rng):
    df = _cloud(50, rng, pwood=rng.uniform(size=50))
    p = str(tmp_path / "c.ply")
    save_file(p, df, additional_fields=["pwood"])
    pc, headers = load_file(p, additional_headers=True)
    assert headers == ["pwood"]
    np.testing.assert_allclose(pc["pwood"].to_numpy(), df["pwood"].to_numpy())


def test_canonicalize_injects_reflectance(rng):
    df = _cloud(10, rng)
    out, headers, had = canonicalize_columns(df, mode="predict")
    assert not had
    assert list(out.columns)[:4] == ["x", "y", "z", "reflectance"]
    assert headers == []  # injected zeros column is not echoed to outputs
    np.testing.assert_array_equal(out["reflectance"].to_numpy(), np.zeros(10))


def test_canonicalize_renames_and_reorders(rng):
    df = _cloud(10, rng, scalar_intensity=rng.normal(size=10), other=np.ones(10))
    out, headers, had = canonicalize_columns(df, mode="predict")
    assert had
    assert list(out.columns) == ["x", "y", "z", "reflectance", "other"]
    assert "reflectance" in headers and "other" in headers


def test_canonicalize_drops_predictions_and_maps_truth(rng):
    df = _cloud(10, rng, label=np.ones(10), pwood=np.ones(10), refl=np.ones(10))
    out, headers, had = canonicalize_columns(df, mode="predict")
    assert "label" not in out.columns and "pwood" not in out.columns
    train_df = _cloud(10, rng, truth=np.ones(10))
    out2, _, _ = canonicalize_columns(train_df, mode="train")
    assert "label" in out2.columns
