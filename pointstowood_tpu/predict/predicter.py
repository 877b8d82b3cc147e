"""Inference engine: padded tile batches -> per-point wood probabilities ->
fusion onto the original cloud.

Equivalent of the reference SemanticSegmentation flow
(reference: pointstowood/src/predicter.py:148-236) rebuilt TPU-first:
tiles stream through one jitted forward per (capacity, batch) shape,
probabilities/thresholded predictions come back with the per-tile centering
undone (predicter.py:211-214), everything is vstacked (points appear once
per grid scale — the implicit two-model ensemble), and the kNN median/vote
fusion labels every original point.

Unlike the reference's BalancedBatchSampler, no tile is ever dropped
(the reference's pairing loop can skip trailing tiles, predicter.py:55-60).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from pointstowood_tpu.config import ModelConfig, PredictConfig, TilingConfig
from pointstowood_tpu.data.dataset import TileBatcher
from pointstowood_tpu.data.tiling import Tile
from pointstowood_tpu.model import Net
from pointstowood_tpu.predict.fusion import Fusion


def build_net(model_cfg: ModelConfig, knn_chunk: int = 2048) -> Net:
    from pointstowood_tpu.utils.host_regime import host_regime

    return Net(
        num_classes=model_cfg.num_classes,
        channels=model_cfg.channels,
        k=model_cfg.k,
        sa_resolutions=tuple(model_cfg.sa_resolutions),
        stage_fractions=tuple(model_cfg.stage_fractions),
        fp_k=model_cfg.fp_k,
        knn_chunk=knn_chunk,
        knn_method=model_cfg.knn_mode,
        knn_recall=model_cfg.knn_recall,
        dtype=jnp.dtype(model_cfg.compute_dtype),
        voxel_priority=getattr(model_cfg, "voxel_priority", "hash"),
        # Transpose-fused FP search: strictly faster on-device (model-fwd
        # 1181 -> 1133 ms on the 1M-pt plot) but measured SLOWER in wall
        # time on remote-relay hosts, whose per-dispatch cost grows with
        # executable size — the same trade as the eval-cap choice, gated
        # by the same measured regime (PTW_TRANSPOSE_KNN env overrides).
        transpose_knn=(host_regime() != "relay"),
    )


@functools.partial(jax.jit, static_argnames=("net",))
def _forward(net: Net, variables, pos, refl, mask, sf):
    logits = net.apply(variables, pos, refl, mask, sf, training=False)
    probs = jax.nn.sigmoid(jnp.nan_to_num(logits))
    return probs


def run_inference(
    tiles: Sequence[Tile],
    variables,
    net: Net,
    predict_cfg: PredictConfig,
    tiling_cfg: TilingConfig,
    mesh=None,
    verbose: bool = False,
    sink=None,
    with_readback: bool = True,
) -> np.ndarray | None:
    """Classify all tiles; returns (M, 5) [x, y, z, pred, prob] rows for
    every valid tile point (reference predicter.py:192-217).

    ``sink``: optional tpu_fusion.FlatSink — each batch's device-resident
    positions and probabilities are written into the fusion flat arrays
    as they are produced (zero-upload fusion). With
    ``with_readback=False`` the host readback of the classified rows is
    skipped entirely (the device fusion path never needs them) and the
    function returns None."""
    from pointstowood_tpu.ops.voxel import check_voxel_pack_range

    # tile extent is bounded by the coarsest tiling grid; the finest SA
    # sampling resolution sets the packed-cell-id density
    check_voxel_pack_range(max(tiling_cfg.grid_size), min(net.sa_resolutions))
    batch_size = predict_cfg.batch_size
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pointstowood_tpu.parallel.mesh import put_sharded

        n_dev = mesh.devices.size
        if batch_size % n_dev:
            batch_size = max(n_dev, (batch_size // n_dev) * n_dev)
        data_sharding = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        variables = jax.device_put(variables, repl)

    batcher = TileBatcher(
        tiles, batch_size=batch_size,
        min_pts=tiling_cfg.min_pts, max_pts=tiling_cfg.max_pts,
        capacity_step=2, scale_batch=True,
    )

    # Pre-warm every bucket's forward executable CONCURRENTLY: the pow2
    # buckets mean up to ~7 (B, cap) shapes per plot, and a relay-compiled
    # backend pays 40-200 s per serial compile but pipelines parallel
    # requests (the fusion warm-up compiles 24 kernels in ~27 s this way).
    # The main loop's own jit calls block per-signature until the matching
    # warm compile lands, so ordering stays correct; warm runs are zeros
    # and their outputs are dropped.
    if mesh is None and batcher.bucket and not batcher.shuffle:
        shapes = sorted({(cap, batcher.batch_size_for(cap))
                         for cap, _ in batcher.batch_plan()})
        if len(shapes) > 1:
            import concurrent.futures

            def _warm(shape):
                cap, b = shape
                try:
                    _forward(
                        net, variables,
                        jnp.zeros((b, cap, 3), jnp.float32),
                        jnp.zeros((b, cap), jnp.float32),
                        jnp.zeros((b, cap), bool),
                        jnp.ones((b,), jnp.float32),
                    )
                except Exception:  # noqa: BLE001 - warm is best-effort
                    pass

            warm_ex = concurrent.futures.ThreadPoolExecutor(max_workers=4)
            for s in shapes:
                warm_ex.submit(_warm, s)
            warm_ex.shutdown(wait=False)

    outputs = []
    pending = []  # (device_probs, host_batch) — double buffer so the host
    # readback of batch i overlaps the device compute of batch i+1

    from pointstowood_tpu.parallel.mesh import fetch

    def drain(entry):
        probs_dev, batch = entry
        probs = fetch(probs_dev)
        preds = (probs >= predict_cfg.is_wood).astype(np.float64)
        xyz = batch.pos.astype(np.float64) + batch.shift[:, None, :].astype(np.float64)
        out = np.concatenate(
            [xyz, preds[..., None], probs.astype(np.float64)[..., None]], axis=-1
        )
        outputs.append(out[batch.mask])

    n_batches = 0
    for cap, batch, _ in batcher:
        n_batches += 1
        pos = jnp.asarray(batch.pos)
        refl = jnp.asarray(batch.reflectance)
        mask = jnp.asarray(batch.mask)
        sf = jnp.asarray(batch.sf)
        if mesh is not None:
            pos, refl, mask, sf = put_sharded(
                data_sharding, pos, refl, mask, sf
            )
        probs_dev = _forward(net, variables, pos, refl, mask, sf)
        if sink is not None:
            sink.write(pos, batch.shift, probs_dev)
        if with_readback:
            pending.append((probs_dev, batch))
            if len(pending) > 2:
                drain(pending.pop(0))
    while pending:
        drain(pending.pop(0))
    if not n_batches:
        raise ValueError("no tiles to classify (cloud smaller than min_pts?)")
    if not with_readback:
        return None
    return np.vstack(outputs)


def semantic_segmentation(
    pc,
    tiles: Sequence[Tile],
    variables,
    model_cfg: ModelConfig,
    predict_cfg: PredictConfig,
    tiling_cfg: TilingConfig,
    mesh=None,
    verbose: bool = False,
    profile_dir: str | None = None,
):
    """Full inference: classify tiles, fuse onto the original cloud.
    Returns the DataFrame with label/pwood columns added.

    The fusion kNN (original points -> classified tile points, the
    plot-scale hot spot: reference predicter.py:136-137) runs CONCURRENTLY
    with the model phase: classified *positions* are just the tile points
    in deterministic batcher order, known before the model produces any
    probability — so the neighbor index build (C++/OpenMP or scipy, both
    GIL-releasing) overlaps device compute instead of serializing after it.

    With ``profile_dir`` set, the model phase runs under a jax.profiler
    trace; ``verbose`` prints per-phase wall-clock (the reference's only
    instrumentation is a whole-run clock, predict.py:140-141)."""
    import concurrent.futures
    import contextlib
    import os
    import time

    from pointstowood_tpu.predict.fusion import knn_indices, warm_fuse

    net = build_net(model_cfg)
    ctx = (
        jax.profiler.trace(profile_dir)
        if profile_dir
        else contextlib.nullcontext()
    )
    t0 = time.perf_counter()

    # Prefetch the fusion neighbor indices (skipped when the
    # reference-parity nbrs.npy cache exists, predicter.py:131-134).
    # 'tpu' mode: per-tile kNN on the chip (see predict/tpu_fusion.py) —
    # the host grid search scales with CPU cores, the TPU path with chips.
    # 'host' mode: exact global search in a worker thread, overlapping the
    # model phase. 'auto' picks tpu whenever the tile map supports it.
    index_future = None
    executor = None
    use_tpu_fusion = False
    cluster_features = getattr(tiling_cfg, "cluster_features", False)
    will_fuse_on_device = False
    plan_future = None
    sink = None
    if not os.path.exists("nbrs.npy"):
        from pointstowood_tpu.predict.tpu_fusion import (
            K_PER_SCALE, FlatSink, fusion_indices, layout_from_batches,
            plan_fusion, warm_fuse_on_device,
        )

        # mirror run_inference's mesh batch-size adjustment: the flat
        # layout is derived from the batch plan and must match exactly
        batch_size = predict_cfg.batch_size
        n_dev = 1 if mesh is None else mesh.devices.size
        if batch_size % n_dev:
            batch_size = max(n_dev, (batch_size // n_dev) * n_dev)
        batcher = TileBatcher(
            tiles, batch_size=batch_size,
            min_pts=tiling_cfg.min_pts, max_pts=tiling_cfg.max_pts,
            capacity_step=2, scale_batch=True,
        )
        order = batcher.tile_order()
        n_source = int(sum(len(tiles[ti]) for ti in order))
        query_xyz = pc[["x", "y", "z"]].to_numpy()
        k = 64 if predict_cfg.any_wood == 1 else 32
        k = min(k, n_source)
        n_scales = len({t.grid_size for t in tiles})
        mode = getattr(predict_cfg, "fusion", "auto")
        use_tpu_fusion = mode == "tpu" or (
            mode == "auto"
            and not cluster_features
            and tiling_cfg.min_pts >= K_PER_SCALE
            and k <= K_PER_SCALE * n_scales
            and all(t.cell_id >= 0 for t in tiles)
        )
        # fuse_on_device's decline conditions are all known up front, so
        # the right fusion kernel can compile concurrently with the model
        will_fuse_on_device = (
            use_tpu_fusion and n_scales == 2 and not cluster_features
            and tiling_cfg.min_pts >= K_PER_SCALE
            and all(t.cell_id >= 0 for t in tiles)
        )
        # zero-upload path: the model phase writes the fusion flat arrays
        # on device and the classified-row readback is skipped entirely
        # (single-device only: sharded batches would need a gather)
        if will_fuse_on_device and n_dev == 1:
            sink = FlatSink(layout_from_batches(
                tiles, batcher.batch_plan(), batcher.batch_size_for
            ))
        executor = concurrent.futures.ThreadPoolExecutor(max_workers=2)
        if not use_tpu_fusion:
            # only the host/index paths need the concatenated source cloud
            source_xyz = np.concatenate(
                [tiles[ti].points[:, :3] for ti in order]
            )
            index_future = executor.submit(
                knn_indices, source_xyz, query_xyz, k
            )
        # build the dispatch plan AND compile the fusion kernel variants
        # concurrently: all shapes are known before any probability exists
        if will_fuse_on_device:
            layout = sink.layout if sink is not None else None

            def _plan_and_warm():
                plan = plan_fusion(
                    tiles, order, query_xyz, tiling_cfg.min_pts,
                    tiling_cfg.max_pts, cluster_features=cluster_features,
                    layout=layout,
                )
                if plan is not None:
                    warm_fuse_on_device(
                        plan, predict_cfg.is_wood, predict_cfg.any_wood,
                        mesh=mesh,
                    )
                return plan

            plan_future = executor.submit(_plan_and_warm)
        else:
            executor.submit(
                warm_fuse, n_source, len(pc), k,
                predict_cfg.is_wood, predict_cfg.any_wood,
            )

    with ctx:
        classified = run_inference(
            tiles, variables, net, predict_cfg, tiling_cfg, mesh=mesh,
            verbose=verbose, sink=sink, with_readback=sink is None,
        )
    t1 = time.perf_counter()
    if verbose:
        n_pts = (int(classified.shape[0]) if classified is not None
                 else int(sum(len(t) for t in tiles)))
        print(
            f"model phase: {t1 - t0:.2f}s, {len(tiles)} tiles, "
            f"{n_pts} classified points "
            f"({n_pts / max(t1 - t0, 1e-9):,.0f} pts/s)"
        )
        print("Spatially aggregating prediction probabilities and labels...")
    indices = None
    fused = None
    if use_tpu_fusion:
        from pointstowood_tpu.predict.tpu_fusion import fuse_on_device

        # preferred: the fully device-side path (kNN + median/vote in one
        # dispatch, nothing but the packed result buffer read back); the
        # index-based TPU path covers the configurations it declines
        plan = plan_future.result() if plan_future is not None else None
        if verbose:
            print(f"fusion: plan wait {time.perf_counter() - t1:.2f}s")
        fused = fuse_on_device(
            tiles, order,
            None if sink is not None
            else classified[:, -1].astype(np.float32),
            query_xyz,
            predict_cfg.is_wood, predict_cfg.any_wood, tiling_cfg.min_pts,
            tiling_cfg.max_pts, verbose=verbose,
            cluster_features=cluster_features, plan=plan,
            resident=sink.arrays() if sink is not None else None,
            mesh=mesh,
        )
        if verbose:
            print(f"fusion: fuse_on_device done at "
                  f"+{time.perf_counter() - t1:.2f}s")
        if fused is None:
            indices = fusion_indices(
                tiles, order,
                np.concatenate([tiles[ti].points[:, :3] for ti in order]),
                query_xyz, k, tiling_cfg.min_pts,
                verbose=verbose, cluster_features=cluster_features,
            )
    elif index_future is not None:
        indices = index_future.result()
        assert indices.shape[0] == len(pc)
    if executor is not None:
        executor.shutdown()
    fusion = Fusion(predict_cfg.is_wood, predict_cfg.any_wood)
    out = fusion.collect_predictions(classified, pc, indices=indices,
                                     fused=fused)
    if verbose:
        t2 = time.perf_counter()
        how = ("tile-local TPU kNN" if use_tpu_fusion
               else "kNN index overlapped with the model phase")
        print(f"fusion phase: {t2 - t1:.2f}s for {len(pc)} original points "
              f"({how})")
    return out
