"""Data-parallel mesh tests on the simulated 8-device CPU platform."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointstowood_tpu.parallel.mesh import batch_sharding, data_mesh, replicated


def test_mesh_has_eight_devices():
    mesh = data_mesh(8)
    assert mesh is not None
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_sharded_inference_matches_single_device():
    from pointstowood_tpu.model import Net

    net = Net(channels=8, knn_chunk=64)
    b, n = 8, 128
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(b, n, 3)).astype(np.float32)
    pos -= pos.mean(axis=1, keepdims=True)
    refl = rng.normal(size=(b, n)).astype(np.float32)
    mask = np.ones((b, n), bool)
    sf = np.linalg.norm(pos, axis=2).max(axis=1).astype(np.float32)
    args = tuple(map(jnp.asarray, (pos, refl, mask, sf)))

    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, *args
    )
    fwd = jax.jit(functools.partial(net.apply, training=False))
    single = np.asarray(fwd(variables, *args))

    mesh = data_mesh(8)
    repl = replicated(mesh)
    shard = batch_sharding(mesh)
    v_r = jax.device_put(variables, repl)
    args_s = tuple(jax.device_put(a, shard) for a in args)
    sharded_out = fwd(v_r, *args_s)
    # output inherits the data sharding across 8 devices
    assert len(sharded_out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded_out), single, rtol=1e-5, atol=1e-6)


def test_sharded_train_step_replicates_params():
    from pointstowood_tpu.config import TrainConfig
    from pointstowood_tpu.model import Net
    from pointstowood_tpu.train.trainer import make_optimizer, make_train_step

    cfg = TrainConfig()
    net = Net(channels=8, knn_chunk=64)
    b, n = 8, 128
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(b, n, 3)).astype(np.float32)
    refl = rng.normal(size=(b, n)).astype(np.float32)
    mask = np.ones((b, n), bool)
    sf = np.linalg.norm(pos, axis=2).max(axis=1).astype(np.float32)
    labels = rng.integers(0, 2, size=(b, n)).astype(np.float32)
    args = tuple(map(jnp.asarray, (pos, refl, mask, sf, labels)))

    variables = jax.jit(functools.partial(net.init, training=True))(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, *args[:4]
    )
    tx = make_optimizer(cfg)
    opt_state = tx.init(variables["params"])

    mesh = data_mesh(8)
    repl = replicated(mesh)
    shard = batch_sharding(mesh)
    params = jax.device_put(variables["params"], repl)
    bs = jax.device_put(variables["batch_stats"], repl)
    opt_state = jax.device_put(opt_state, repl)
    args_s = tuple(jax.device_put(a, shard) for a in args)

    step = make_train_step(net, tx, cfg)
    new_params, new_bs, new_opt, loss, counts, finite = step(
        params, bs, opt_state, *args_s, jnp.float32(1e-4), jax.random.key(2)
    )
    assert bool(finite)
    assert np.isfinite(float(loss))
    # updated params live on all 8 devices (replicated after the grad psum)
    leaf = jax.tree_util.tree_leaves(new_params)[0]
    assert len(leaf.sharding.device_set) == 8
    assert leaf.sharding.is_fully_replicated
    # parameters actually moved
    before = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(before))


def test_run_inference_with_mesh_matches_single_device(rng):
    """The predict engine with an 8-device mesh produces the same classified
    rows as single-device execution."""
    from pointstowood_tpu.config import ModelConfig, PredictConfig, TilingConfig
    from pointstowood_tpu.data.tiling import Tile
    from pointstowood_tpu.predict.predicter import build_net, run_inference

    tiles = [
        Tile(points=rng.normal(size=(n, 4)).astype(np.float32), grid_size=2.0)
        for n in [100, 150, 200, 120, 180, 90, 240, 110, 130]
    ]
    model_cfg = ModelConfig(channels=8, compute_dtype="float32")
    tiling_cfg = TilingConfig(grid_size=(2.0,), min_pts=64, max_pts=256)
    predict_cfg = PredictConfig(batch_size=8)
    net = build_net(model_cfg, knn_chunk=64)

    b0 = tiles[0].points
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)},
        jnp.asarray(b0[None, :, :3]), jnp.asarray(b0[None, :, 3]),
        jnp.ones((1, b0.shape[0]), bool), jnp.ones((1,)),
    )
    single = run_inference(tiles, variables, net, predict_cfg, tiling_cfg)
    mesh = data_mesh(8)
    sharded = run_inference(tiles, variables, net, predict_cfg, tiling_cfg,
                            mesh=mesh)
    assert single.shape == sharded.shape
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


def test_put_sharded_multihost_slicing(monkeypatch):
    """Multi-host placement logic without multi-host hardware: each
    process must hand JAX exactly the global-batch rows its own devices
    own (process-contiguous device order), and fetch must all-gather
    non-replicated arrays."""
    from pointstowood_tpu.parallel import mesh as pmesh

    mesh = data_mesh(8)
    sharding = batch_sharding(mesh)
    captured = {}

    def fake_make(shard, local, global_shape):
        captured["local"] = np.asarray(local)
        captured["global_shape"] = global_shape
        return jnp.asarray(local)

    monkeypatch.setattr(pmesh.jax, "process_count", lambda: 2)
    monkeypatch.setattr(pmesh.jax, "process_index", lambda: 1)
    monkeypatch.setattr(
        pmesh.jax, "make_array_from_process_local_data", fake_make
    )
    batch = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    (out,) = pmesh.put_sharded(sharding, batch)
    # process 1 of 2 owns the second half of the global batch
    np.testing.assert_array_equal(captured["local"], batch[4:])
    assert captured["global_shape"] == (8, 3)

    # fetch: replicated arrays pass through even when process_count > 1
    repl = jax.device_put(jnp.ones((4,)), replicated(mesh))
    np.testing.assert_array_equal(pmesh.fetch(repl), np.ones((4,)))
