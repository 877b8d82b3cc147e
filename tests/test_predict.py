"""Fusion tests and the end-to-end predict CLI slice."""

import os

import numpy as np
import pandas as pd
import pytest

from pointstowood_tpu.predict.fusion import fuse_labels


def _fusion_oracle(classified, query_xyz, any_wood):
    """Direct numpy restatement of the reference compute_labels
    (predicter.py:113-127) + pykdtree query (predicter.py:136-137)."""
    from scipy.spatial import cKDTree

    k = 64 if any_wood == 1 else 32
    k = min(k, classified.shape[0])
    _, idx = cKDTree(classified[:, :3]).query(query_xyz, k=k)
    if k == 1:
        idx = idx[:, None]
    nbr = classified[idx]  # (n, k, 5)
    labels = np.zeros((query_xyz.shape[0], 2))
    for i in range(query_xyz.shape[0]):
        labels[i, 1] = np.median(nbr[i, :, -1])
        if any_wood != 1:
            labels[i, 0] = 1 if np.any(nbr[i, :, -2] > any_wood) else 0
        else:
            votes = np.zeros(k)
            for j in range(k):
                votes[j] = np.sum((nbr[i, :, -2] == j) * nbr[i, :, -1])
            labels[i, 0] = np.argmax(votes)
    return labels


@pytest.mark.parametrize("any_wood", [1.0, 0.9])
def test_fuse_labels_matches_reference_oracle(any_wood, rng):
    m, n = 500, 100
    # predictions are the threshold of the probabilities, exactly as
    # run_inference emits them (and as fuse_labels now derives in-kernel)
    prob = rng.uniform(0, 1, size=(m, 1))
    classified = np.concatenate(
        [
            rng.uniform(0, 5, size=(m, 3)),
            (prob >= 0.5).astype(float),
            prob,
        ],
        axis=1,
    )
    query = rng.uniform(0, 5, size=(n, 3))
    ours = fuse_labels(classified, query, is_wood=0.5, any_wood=any_wood, chunk=64)
    ref = _fusion_oracle(classified, query, any_wood)
    np.testing.assert_allclose(ours[:, 1], ref[:, 1], rtol=1e-6)
    np.testing.assert_array_equal(ours[:, 0], ref[:, 0])


def test_fuse_labels_applies_is_wood_threshold(rng):
    """fuse_labels derives per-point predictions from prob >= is_wood, so
    sweeping the threshold changes the vote without rewriting columns
    (advisor finding: the parameter used to be dead)."""
    m, n = 400, 120
    prob = rng.uniform(0, 1, size=(m, 1))
    classified = np.concatenate(
        [rng.uniform(0, 5, size=(m, 3)), (prob >= 0.5).astype(float), prob],
        axis=1,
    )
    query = rng.uniform(0, 5, size=(n, 3))
    low = fuse_labels(classified, query, is_wood=0.05, any_wood=1.0)
    high = fuse_labels(classified, query, is_wood=0.95, any_wood=1.0)
    assert low[:, 0].sum() > high[:, 0].sum()
    # pwood is threshold-independent (median of probabilities)
    np.testing.assert_allclose(low[:, 1], high[:, 1], rtol=1e-6)
    # and each threshold matches an oracle fed consistently-thresholded preds
    for t, ours in ((0.05, low), (0.95, high)):
        c = classified.copy()
        c[:, -2] = (c[:, -1] >= t).astype(float)
        ref = _fusion_oracle(c, query, 1.0)
        np.testing.assert_array_equal(ours[:, 0], ref[:, 0])


def test_tile_order_matches_classified_rows(rng):
    """The fusion-overlap invariant: concatenating tile xyz in
    TileBatcher.tile_order() reproduces run_inference's vstacked classified
    positions (so the kNN index built before the model runs indexes the
    same rows the probabilities land in)."""
    import functools

    import jax
    import jax.numpy as jnp

    from pointstowood_tpu.config import ModelConfig, PredictConfig, TilingConfig
    from pointstowood_tpu.data.dataset import TileBatcher
    from pointstowood_tpu.data.tiling import Tile
    from pointstowood_tpu.predict.predicter import build_net, run_inference

    tiles = [
        Tile(points=(rng.normal(size=(n, 4)) * [1, 1, 1, 0.5]).astype(np.float32),
             grid_size=2.0)
        for n in [100, 300, 150, 90, 260, 120, 180]
    ]
    tiling_cfg = TilingConfig(grid_size=(2.0,), min_pts=64, max_pts=512)
    predict_cfg = PredictConfig(batch_size=2)
    net = build_net(ModelConfig(channels=8, compute_dtype="float32"), knn_chunk=64)
    b0 = tiles[0].points
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)},
        jnp.asarray(b0[None, :, :3]), jnp.asarray(b0[None, :, 3]),
        jnp.ones((1, b0.shape[0]), bool), jnp.ones((1,)),
    )
    classified = run_inference(tiles, variables, net, predict_cfg, tiling_cfg)

    order = TileBatcher(
        tiles, batch_size=predict_cfg.batch_size,
        min_pts=tiling_cfg.min_pts, max_pts=tiling_cfg.max_pts,
    ).tile_order()
    source_xyz = np.concatenate([tiles[ti].points[:, :3] for ti in order])
    assert source_xyz.shape[0] == classified.shape[0]
    # classified xyz went through a center/un-center float32 roundtrip
    np.testing.assert_allclose(classified[:, :3], source_xyz, atol=1e-5)
    # and order is independent of the batch size (only boundaries move)
    order8 = TileBatcher(tiles, batch_size=8, min_pts=64, max_pts=512).tile_order()
    assert order == order8


def _synthetic_tree(n_wood=1500, n_leaf=2500, seed=7):
    """A crude tree: vertical cylinder trunk (wood, bright reflectance) +
    a diffuse crown (leaf, dim reflectance)."""
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n_wood)
    r = rng.uniform(0, 0.15, n_wood)
    trunk = np.stack(
        [r * np.cos(theta), r * np.sin(theta), rng.uniform(0, 6, n_wood)], axis=1
    )
    crown = np.stack(
        [
            rng.normal(0, 1.2, n_leaf),
            rng.normal(0, 1.2, n_leaf),
            4.0 + rng.normal(0, 1.0, n_leaf),
        ],
        axis=1,
    )
    xyz = np.concatenate([trunk, crown])
    refl = np.concatenate(
        [rng.normal(2.0, 0.3, n_wood), rng.normal(-1.0, 0.5, n_leaf)]
    )
    labels = np.concatenate([np.ones(n_wood), np.zeros(n_leaf)])
    df = pd.DataFrame(
        {"x": xyz[:, 0] + 100.0, "y": xyz[:, 1] + 50.0, "z": xyz[:, 2],
         "reflectance": refl, "truth": labels}
    )
    return df


def test_predict_cli_end_to_end(tmp_path):
    """Minimum end-to-end slice: synthetic PLY -> CLI -> labeled PLY."""
    import jax
    from pointstowood_tpu.io import read_ply, write_ply
    from pointstowood_tpu.model import Net
    from pointstowood_tpu.utils.checkpoint import save_checkpoint
    import functools
    import jax.numpy as jnp
    import predict as predict_cli

    df = _synthetic_tree()
    cloud_path = str(tmp_path / "tree.ply")
    write_ply(cloud_path, df.drop(columns=["truth"]))

    # random-weight checkpoint in native format
    net = Net()
    init_fn = jax.jit(functools.partial(net.init, training=False))
    variables = init_fn(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 256, 3)), jnp.zeros((1, 256)),
        jnp.ones((1, 256), bool), jnp.ones((1,)),
    )
    model_path = str(tmp_path / "model.ckpt")
    save_checkpoint(model_path, variables)

    predict_cli.main(
        [
            "--point-cloud", cloud_path,
            "--model", model_path,
            "--grid_size", "4.0",
            "--min_pts", "64",
            "--max_pts", "1024",
            "--batch_size", "2",
            "--is-wood", "0.5",
            "--dtype", "float32",
        ]
    )

    out_path = str(tmp_path / "tree_ours.ply")
    assert os.path.exists(out_path)
    out = read_ply(out_path)
    for col in ("label", "pwood", "n_z"):
        assert col in out.columns, out.columns
    assert len(out) == len(df)
    assert set(np.unique(out["label"])) <= {0.0, 1.0}
    assert (out["pwood"] >= 0).all() and (out["pwood"] <= 1).all()
    # xyz preserved
    np.testing.assert_allclose(out["x"].to_numpy(), df["x"].to_numpy(), atol=1e-9)


def test_predict_cli_multi_file_pipeline(tmp_path):
    """Multiple --point-cloud files run through the double-buffered loop
    (plot N+1 preprocess and plot N-1 save overlap plot N's device
    phase); every output must land with the right row count."""
    import jax
    from pointstowood_tpu.io import read_ply, write_ply
    from pointstowood_tpu.model import Net
    from pointstowood_tpu.utils.checkpoint import save_checkpoint
    import functools
    import jax.numpy as jnp
    import predict as predict_cli

    paths = []
    for i in range(3):
        df = _synthetic_tree(seed=11 + i)
        p = str(tmp_path / f"tree{i}.ply")
        write_ply(p, df.drop(columns=["truth"]))
        paths.append((p, len(df)))

    net = Net()
    init_fn = jax.jit(functools.partial(net.init, training=False))
    variables = init_fn(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 256, 3)), jnp.zeros((1, 256)),
        jnp.ones((1, 256), bool), jnp.ones((1,)),
    )
    model_path = str(tmp_path / "model.ckpt")
    save_checkpoint(model_path, variables)

    predict_cli.main(
        [
            "--point-cloud", *(p for p, _ in paths),
            "--model", model_path,
            "--grid_size", "4.0",
            "--min_pts", "64",
            "--max_pts", "1024",
            "--batch_size", "2",
            "--dtype", "float32",
        ]
    )

    for p, n in paths:
        out_path = p[:-4] + "_ours.ply"
        assert os.path.exists(out_path), out_path
        out = read_ply(out_path)
        assert len(out) == n
        assert {"label", "pwood"} <= set(out.columns)


def test_enable_compile_cache(tmp_path, monkeypatch):
    """The CLIs point JAX's persistent compilation cache at a durable
    directory; env opt-out and the standard JAX variable both win."""
    import jax

    from pointstowood_tpu.utils.compile_cache import enable_compile_cache

    monkeypatch.delenv("POINTSTOWOOD_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "xla"))
    used = enable_compile_cache()
    assert used == str(tmp_path / "xla")
    assert os.path.isdir(used)
    assert jax.config.jax_compilation_cache_dir == used

    monkeypatch.setenv("POINTSTOWOOD_NO_COMPILE_CACHE", "1")
    assert enable_compile_cache() is None
    jax.config.update("jax_compilation_cache_dir", None)  # isolate tests
