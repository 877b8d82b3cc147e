"""Worker process for the 2-process multi-host integration test.

Launched by tests/test_multihost.py with PTW_COORDINATOR_ADDRESS /
PTW_NUM_PROCESSES / PTW_PROCESS_ID set. Each process simulates 4 CPU
devices, so the distributed bootstrap yields an 8-device global mesh split
across 2 processes — the smallest real exercise of the multi-host code
paths (``maybe_init_distributed``, ``put_sharded`` local-slice placement,
cross-process collectives, ``fetch`` all-gather, process-0-only writers)
without multi-host hardware.

Usage: python multihost_worker.py <wdir-for-this-process>
"""

import os
import sys

import jax

# this environment's sitecustomize force-sets jax_platforms to "axon,cpu";
# override the config directly (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from pointstowood_tpu.parallel.mesh import (  # noqa: E402
    data_mesh,
    maybe_init_distributed,
)

assert maybe_init_distributed(verbose=True), "bootstrap did not go multi-process"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.devices()
assert len(jax.local_devices()) == 4

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pointstowood_tpu.config import (  # noqa: E402
    ModelConfig,
    PredictConfig,
    TilingConfig,
    TrainConfig,
)
from pointstowood_tpu.data.tiling import Tile, preprocess_cloud  # noqa: E402
from pointstowood_tpu.io.loader import canonicalize_columns  # noqa: E402
from pointstowood_tpu.train.trainer import semantic_training  # noqa: E402


def _labeled_tree_df(seed=11, n_wood=500, n_leaf=700):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n_wood)
    r = rng.uniform(0, 0.15, n_wood)
    trunk = np.stack(
        [r * np.cos(theta), r * np.sin(theta), rng.uniform(0, 6, n_wood)], axis=1
    )
    crown = np.stack(
        [rng.normal(0, 1.0, n_leaf), rng.normal(0, 1.0, n_leaf),
         4.0 + rng.normal(0, 0.8, n_leaf)], axis=1,
    )
    xyz = np.concatenate([trunk, crown])
    refl = np.concatenate(
        [rng.normal(2.0, 0.3, n_wood), rng.normal(-1.0, 0.5, n_leaf)]
    )
    labels = np.concatenate([np.ones(n_wood), np.zeros(n_leaf)])
    return pd.DataFrame(
        {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
         "reflectance": refl, "truth": labels}
    )


def main():
    wdir = sys.argv[1]
    # identical deterministic input pipeline on every host (the documented
    # multi-host contract: hosts are fed the same global batches and
    # put_sharded slices out each process's rows)
    df, _, _ = canonicalize_columns(_labeled_tree_df(), mode="train")
    tiling = TilingConfig(grid_size=(4.0,), min_pts=32, max_pts=256)
    tiles = preprocess_cloud(df, tiling, with_labels=True)
    assert len(tiles) >= 2

    cfg = TrainConfig(num_epochs=2, batch_size=2, learning_rate=1e-3)
    model_cfg = ModelConfig(channels=8, compute_dtype="float32")
    mesh = data_mesh()
    assert mesh is not None and mesh.devices.size == 8
    state, history = semantic_training(
        tiles, cfg, model_cfg, tiling, wdir=wdir, model_name="m.ckpt",
        checkpoints=[2], verbose=False, log_fn=lambda s: None, mesh=mesh,
    )
    hist = np.asarray(history)

    # sharded inference through the engine exercises put_sharded + fetch
    from pointstowood_tpu.model import Net  # noqa: E402
    from pointstowood_tpu.predict.predicter import run_inference  # noqa: E402

    pred_tiles = [
        Tile(points=t.points[:, :4].copy(), grid_size=t.grid_size)
        for t in tiles[:3]
    ]
    net = Net(channels=8, knn_chunk=64)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    classified = run_inference(
        pred_tiles, variables, net, PredictConfig(batch_size=8), tiling,
        mesh=mesh,
    )

    ckpt = os.path.exists(os.path.join(wdir, "model", "m.ckpt"))
    hist_csv = os.path.exists(os.path.join(wdir, "model", "m_history.csv"))
    print(
        "RESULT proc=%d loss_first=%.6f loss_last=%.6f pred_sum=%.6f "
        "pred_rows=%d ckpt=%d hist=%d"
        % (
            jax.process_index(), hist[0, 2], hist[-1, 2],
            float(np.asarray(classified[:, -1]).sum()), classified.shape[0],
            int(ckpt), int(hist_csv),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
