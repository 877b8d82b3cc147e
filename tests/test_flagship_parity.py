"""Flagship-configuration parity: C=32, >=4096-pt tiles, dual grid,
through the REAL predict engine (VERDICT r2 item 4).

The C=8/N=512 oracle test (test_full_net_parity.py) pins layer math; this
test pins the configuration real weights will actually face: the full
predict path (preprocess -> TileBatcher -> run_inference -> fusion) at
channels=32 with tile sizes above 4096, asserting BOTH per-point
probability tolerance against the torch oracle AND fused-label agreement
against the reference-exact host fusion.

Runtime note: one C=32 exact-path CPU compile + a ~6k-pt torch oracle
forward — the slowest test in the suite by design (flagship evidence).
"""

import functools

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import OracleNet
from pointstowood_tpu.config import (
    ModelConfig, PredictConfig, TilingConfig,
)
from pointstowood_tpu.data.dataset import TileBatcher
from pointstowood_tpu.data.tiling import preprocess_cloud
from pointstowood_tpu.io.loader import canonicalize_columns
from pointstowood_tpu.model import Net
from pointstowood_tpu.predict.fusion import fuse_labels
from pointstowood_tpu.predict.predicter import (
    run_inference, semantic_segmentation,
)
from pointstowood_tpu.utils.checkpoint_convert import (
    convert_torch_state_dict,
    merge_into_variables,
)

C = 32
N = 6000
K = 32


def _plot_cloud(seed=141190):
    """~6k points over 1.8 x 1.8 x 0.78 m at the parity-safe density
    (no 0.08 m SA1 radius ball holds more than k=32 points), with a
    reflectance column so the quantile normalization path runs."""
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(0, 1, size=(N, 3)) * [1.8, 1.8, 0.78]
    refl = rng.normal(size=N)
    return pd.DataFrame({
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "reflectance": refl.astype(np.float32),
    })


def _randomized_oracle(seed=7):
    om = OracleNet(C=C, k=K).eval()
    grng = np.random.default_rng(seed)
    sd = om.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.tensor(
                grng.uniform(0.5, 2.0, size=v.shape).astype(np.float32)
            )
        elif k.endswith("num_batches_tracked"):
            continue
        else:
            sd[k] = torch.tensor(
                (grng.normal(size=v.shape) * 0.2).astype(np.float32)
            )
    om.load_state_dict(sd)
    return om


def test_flagship_engine_parity():
    pc = _plot_cloud()
    pc, _, _ = canonicalize_columns(pc, mode="predict")
    tiling_cfg = TilingConfig(grid_size=(2.0, 4.0), min_pts=64,
                              max_pts=8192)
    tiles = preprocess_cloud(pc, tiling_cfg)
    assert len({t.grid_size for t in tiles}) == 2
    assert max(len(t) for t in tiles) >= 4096, "flagship tile size"

    # --- flax net in the parity configuration, through the REAL engine
    model_cfg = ModelConfig(
        channels=C, knn_mode="exact", compute_dtype="float32",
        stage_fractions=(1.0, 1.0, 1.0), voxel_priority="last",
    )
    predict_cfg = PredictConfig(batch_size=2, dtype="float32")
    net = Net(
        channels=C, k=K, knn_method="exact", voxel_priority="last",
        stage_fractions=(1.0, 1.0, 1.0), dtype=jnp.float32,
    )
    ex = jnp.zeros((1, 256, 3)), jnp.zeros((1, 256)), jnp.ones((1, 256), bool), jnp.ones((1,))
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, *ex
    )
    om = _randomized_oracle()
    merged = merge_into_variables(
        variables, convert_torch_state_dict(om.state_dict())
    )

    classified = run_inference(
        tiles, merged, net, predict_cfg, tiling_cfg
    )

    # --- torch oracle on the identical tiles (batcher centering: shift =
    # mean of xyz, sf = max centered norm, data/dataset.py pad_tiles)
    order = TileBatcher(
        tiles, batch_size=predict_cfg.batch_size,
        min_pts=tiling_cfg.min_pts, max_pts=tiling_cfg.max_pts,
    ).tile_order()
    ref_probs = []
    for t in order:
        pts = tiles[t].points
        xyz_c = pts[:, :3] - pts[:, :3].mean(axis=0)
        sf = float(np.sqrt((xyz_c ** 2).sum(axis=1)).max())
        with torch.no_grad():
            logits = om(
                torch.tensor(xyz_c.astype(np.float32)),
                torch.tensor(pts[:, 3].astype(np.float32)),
                torch.tensor(sf),
            ).numpy()
        ref_probs.append(1.0 / (1.0 + np.exp(-logits)))
    ref_probs = np.concatenate(ref_probs)

    assert classified.shape[0] == ref_probs.shape[0]
    dp = np.abs(classified[:, -1] - ref_probs)
    assert float(dp.max()) < 5e-4, f"max |delta prob| = {dp.max()}"
    assert float(dp.mean()) < 5e-5, f"mean |delta prob| = {dp.mean()}"

    # --- fused labels through the engine (TPU-fusion path on CPU) vs the
    # reference-exact host fusion over the oracle probabilities
    out = semantic_segmentation(
        pc, tiles, merged, model_cfg, predict_cfg, tiling_cfg
    )
    ref_classified = np.concatenate([
        np.concatenate([
            tiles[t].points[:, :3],
            np.zeros((len(tiles[t]), 1)),
        ], axis=1) for t in order
    ])
    ref_classified = np.concatenate(
        [ref_classified, ref_probs[:, None]], axis=1
    )
    ref_fused = fuse_labels(
        ref_classified, pc[["x", "y", "z"]].to_numpy(),
        predict_cfg.is_wood, predict_cfg.any_wood,
    )
    agree = (out["label"].to_numpy() == ref_fused[:, 0]).mean()
    assert agree > 0.99, f"fused-label agreement {agree}"
    d_pwood = np.abs(out["pwood"].to_numpy() - ref_fused[:, 1])
    assert float(d_pwood.mean()) < 0.01, f"mean |delta pwood| {d_pwood.mean()}"
