"""Tile-local TPU fusion kNN vs the exact host search."""

import numpy as np
import pandas as pd
import pytest

from pointstowood_tpu.config import (
    ModelConfig, PredictConfig, TilingConfig,
)
from pointstowood_tpu.data.dataset import TileBatcher
from pointstowood_tpu.data.tiling import preprocess_cloud
from pointstowood_tpu.io.loader import canonicalize_columns
from pointstowood_tpu.predict.fusion import fuse_labels, knn_indices
from pointstowood_tpu.predict.tpu_fusion import fusion_indices, tile_knn_indices


def _cloud(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n // 3)
    r = rng.uniform(0, 0.2, n // 3)
    trunk = np.stack(
        [3 + r * np.cos(theta), 3 + r * np.sin(theta),
         rng.uniform(0, 5, n // 3)], 1,
    )
    crown = np.stack(
        [3 + rng.normal(0, 1.2, n - n // 3), 3 + rng.normal(0, 1.2, n - n // 3),
         4 + rng.normal(0, 0.8, n - n // 3)], 1,
    )
    xyz = np.concatenate([trunk, crown])
    return pd.DataFrame({
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "reflectance": rng.normal(size=n),
    })


@pytest.fixture(scope="module")
def tiled_cloud():
    df = _cloud()
    df, _, _ = canonicalize_columns(df, mode="predict")
    cfg = TilingConfig(grid_size=(2.0, 4.0), min_pts=64, max_pts=4096)
    tiles = preprocess_cloud(df, cfg)
    order = TileBatcher(
        tiles, batch_size=4, min_pts=cfg.min_pts, max_pts=cfg.max_pts
    ).tile_order()
    classified_xyz = np.concatenate(
        [tiles[t].points[:, :3] for t in order]
    )
    query_xyz = df[["x", "y", "z"]].to_numpy()
    return tiles, order, classified_xyz, query_xyz, cfg


def test_tile_knn_covers_and_indexes_correctly(tiled_cloud):
    tiles, order, classified_xyz, query_xyz, cfg = tiled_cloud
    idx, d2, covered = tile_knn_indices(tiles, order, query_xyz, cfg.min_pts)
    assert idx.shape == (len(query_xyz), 64)  # 32 per scale, 2 scales
    assert covered.mean() > 0.9  # min_pts drops only sparse fringe cells
    # returned distances match the actual classified positions on real
    # slots; scale-fill slots carry +inf sentinels (so the k=32 merge
    # can't double-count a single-coverage row's duplicated block) and
    # every covered row keeps at least one full real block of 32
    rows = np.flatnonzero(covered)[:200]
    sel = classified_xyz[idx[rows]]  # (r, 64, 3)
    d2_check = ((sel - query_xyz[rows][:, None, :]) ** 2).sum(-1)
    fin = np.isfinite(d2[rows])
    assert fin.sum(axis=1).min() >= 32
    np.testing.assert_allclose(
        d2[rows][fin], d2_check[fin], rtol=1e-4, atol=1e-5
    )


def test_warm_fuse_on_device_precompiles_exact_shapes(tiled_cloud):
    """The concurrent warm-up must hit the very (shape, static-arg) key
    fuse_on_device later uses — shape drift would silently move the
    compile back onto the post-model critical path."""
    from pointstowood_tpu.predict.tpu_fusion import (
        _fused_pair_knn, fuse_on_device, plan_fusion, warm_fuse_on_device,
    )

    tiles, order, classified_xyz, query_xyz, cfg = tiled_cloud
    prob = np.linspace(0, 1, classified_xyz.shape[0]).astype(np.float32)
    plan = plan_fusion(tiles, order, query_xyz, cfg.min_pts, cfg.max_pts)
    assert plan is not None and len(plan.combos) >= 1
    warm_fuse_on_device(plan, 0.5, 1.0)
    warmed = _fused_pair_knn._cache_size()
    assert warmed >= len(plan.combos)
    fused = fuse_on_device(
        tiles, order, prob, query_xyz, 0.5, 1.0, cfg.min_pts, cfg.max_pts,
        plan=plan,
    )
    assert fused is not None
    assert _fused_pair_knn._cache_size() == warmed, (
        "fuse_on_device compiled a shape the warm-up did not cover")


def test_plan_fusion_cache_hits_and_invalidates(tiled_cloud):
    """Repeat planning of the same plot returns the memoized plan; any
    input perturbation (queries, tile set) misses the cache."""
    from pointstowood_tpu.predict import tpu_fusion as tf

    tiles, order, classified_xyz, query_xyz, cfg = tiled_cloud
    tf._PLAN_CACHE.clear()
    p1 = tf.plan_fusion(tiles, order, query_xyz, cfg.min_pts, cfg.max_pts)
    assert p1 is not None
    p2 = tf.plan_fusion(tiles, order, query_xyz, cfg.min_pts, cfg.max_pts)
    assert p2 is p1
    # perturbed queries -> fresh plan
    q3 = query_xyz + 0.25
    p3 = tf.plan_fusion(tiles, order, q3, cfg.min_pts, cfg.max_pts)
    assert p3 is not p1
    # different min_pts -> fresh plan even with identical arrays
    p4 = tf.plan_fusion(tiles, order, query_xyz, cfg.min_pts + 1,
                        cfg.max_pts)
    assert p4 is not p1
    # cache is bounded
    assert len(tf._PLAN_CACHE) <= tf._PLAN_CACHE_MAX


def test_fusion_indices_agree_with_host_search(tiled_cloud):
    """Labels fused from tile-local neighbors match the exact global host
    search almost everywhere (border effects only)."""
    tiles, order, classified_xyz, query_xyz, cfg = tiled_cloud
    rng = np.random.default_rng(1)
    m = classified_xyz.shape[0]
    # synthetic probabilities correlated with position (wood near trunk)
    prob = 1 / (1 + np.exp(
        (np.linalg.norm(classified_xyz[:, :2] - 3.0, axis=1) - 0.4) * 4
    ))
    classified = np.concatenate(
        [classified_xyz, (prob >= 0.5)[:, None], prob[:, None]], axis=1
    )
    for k in (64, 32):
        tpu_idx = fusion_indices(
            tiles, order, classified_xyz, query_xyz, k, cfg.min_pts
        )
        host_idx = knn_indices(classified_xyz, query_xyz, k)
        out_tpu = fuse_labels(classified, query_xyz, 0.5,
                              1.0 if k == 64 else 2.0, indices=tpu_idx)
        out_host = fuse_labels(classified, query_xyz, 0.5,
                               1.0 if k == 64 else 2.0, indices=host_idx)
        agree = (out_tpu[:, 0] == out_host[:, 0]).mean()
        assert agree > 0.98, f"k={k}: label agreement {agree}"
        assert np.abs(out_tpu[:, 1] - out_host[:, 1]).mean() < 0.02


def test_fuse_on_device_matches_host_fusion(tiled_cloud):
    """The fully device-side path (kNN + median/vote in one dispatch)
    agrees with the exact host-search fusion."""
    from pointstowood_tpu.predict.tpu_fusion import fuse_on_device

    tiles, order, classified_xyz, query_xyz, cfg = tiled_cloud
    prob = 1 / (1 + np.exp(
        (np.linalg.norm(classified_xyz[:, :2] - 3.0, axis=1) - 0.4) * 4
    )).astype(np.float64)
    classified = np.concatenate(
        [classified_xyz, (prob >= 0.5)[:, None], prob[:, None]], axis=1
    )
    for any_wood, k in ((1.0, 64), (2.0, 32)):
        fused = fuse_on_device(
            tiles, order, prob.astype(np.float32), query_xyz, 0.5, any_wood,
            cfg.min_pts, cfg.max_pts,
        )
        assert fused is not None and fused.shape == (len(query_xyz), 2)
        host_idx = knn_indices(classified_xyz, query_xyz, k)
        out_host = fuse_labels(classified, query_xyz, 0.5, any_wood,
                               indices=host_idx)
        agree = (fused[:, 0] == out_host[:, 0]).mean()
        assert agree > 0.98, f"any_wood={any_wood}: agreement {agree}"
        assert np.abs(fused[:, 1] - out_host[:, 1]).mean() < 0.02
    # NaN query rows must come back inert (label 0, pwood 0), not poison
    # neighbouring dispatch rows
    qn = query_xyz.copy()
    qn[7] = np.nan
    fused_nan = fuse_on_device(
        tiles, order, prob.astype(np.float32), qn, 0.5, 1.0,
        cfg.min_pts, cfg.max_pts,
    )
    assert fused_nan is not None
    assert fused_nan[7, 0] == 0.0 and fused_nan[7, 1] == 0.0
    ok = np.ones(len(qn), bool)
    ok[7] = False
    prev = fuse_on_device(
        tiles, order, prob.astype(np.float32), query_xyz, 0.5, 1.0,
        cfg.min_pts, cfg.max_pts,
    )
    assert np.array_equal(fused_nan[ok], prev[ok])

    # single-scale tiling: path declines (index/host paths take over)
    single = [t for t in tiles if t.grid_size == 2.0]
    assert fuse_on_device(
        single, list(range(len(single))), prob[: sum(len(t) for t in single)]
        .astype(np.float32), query_xyz, 0.5, 1.0, cfg.min_pts, cfg.max_pts,
    ) is None


def test_resident_queries_match_uploaded_queries(tiled_cloud):
    """Queries that are rows of their fine tile read their coordinates
    from the device-resident flat array (zero upload). Stripping the tile
    indices forces every query onto the uploaded-extras path — both must
    fuse to the same output, and the resident plan must actually keep
    most rows off the upload."""
    import dataclasses

    from pointstowood_tpu.predict.tpu_fusion import (
        fuse_on_device, plan_fusion,
    )

    tiles, order, classified_xyz, query_xyz, cfg = tiled_cloud
    prob = (1 / (1 + np.exp(
        (np.linalg.norm(classified_xyz[:, :2] - 3.0, axis=1) - 0.4) * 4
    ))).astype(np.float32)

    plan = plan_fusion(tiles, order, query_xyz, cfg.min_pts, cfg.max_pts)
    assert plan is not None
    n_uploaded = int((plan.extra_perm >= 0).sum())
    n_covered = int((plan.perm >= 0).sum())
    assert n_uploaded < n_covered * 0.5, (
        f"resident path inactive: {n_uploaded}/{n_covered} rows uploaded")

    legacy = [dataclasses.replace(t, indices=None) for t in tiles]
    plan_legacy = plan_fusion(legacy, order, query_xyz, cfg.min_pts,
                              cfg.max_pts)
    assert int((plan_legacy.extra_perm >= 0).sum()) == n_covered

    for any_wood in (1.0, 2.0):
        res = fuse_on_device(tiles, order, prob, query_xyz, 0.5, any_wood,
                             cfg.min_pts, cfg.max_pts, plan=plan)
        up = fuse_on_device(legacy, order, prob, query_xyz, 0.5, any_wood,
                            cfg.min_pts, cfg.max_pts, plan=plan_legacy)
        assert res is not None and up is not None
        np.testing.assert_array_equal(res[:, 0], up[:, 0])
        np.testing.assert_allclose(res[:, 1], up[:, 1], atol=1e-6)


def test_sharded_fusion_matches_single_device(tiled_cloud):
    """Under a multi-device mesh the pair dispatches shard over the data
    axis (each chip fuses its own slice of the plot's tile pairs); the
    result must equal the single-device accumulating path exactly."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from pointstowood_tpu.predict.tpu_fusion import fuse_on_device

    tiles, order, classified_xyz, query_xyz, cfg = tiled_cloud
    prob = (1 / (1 + np.exp(
        (np.linalg.norm(classified_xyz[:, :2] - 3.0, axis=1) - 0.4) * 4
    ))).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    for any_wood in (1.0, 2.0):
        single = fuse_on_device(tiles, order, prob, query_xyz, 0.5,
                                any_wood, cfg.min_pts, cfg.max_pts)
        sharded = fuse_on_device(tiles, order, prob, query_xyz, 0.5,
                                 any_wood, cfg.min_pts, cfg.max_pts,
                                 mesh=mesh)
        assert single is not None and sharded is not None
        np.testing.assert_array_equal(sharded, single)


def test_fusion_indices_host_fallback_when_unsupported(tiled_cloud):
    tiles, order, classified_xyz, query_xyz, cfg = tiled_cloud
    # min_pts below 32 -> the tile map cannot guarantee 32 candidates;
    # the function must fall back to the exact host search
    idx = fusion_indices(tiles, order, classified_xyz, query_xyz, 64,
                         min_pts=8)
    host = knn_indices(classified_xyz, query_xyz, 64)
    np.testing.assert_array_equal(np.sort(idx, 1), np.sort(host, 1))


def test_flat_sink_matches_host_upload_path(tiled_cloud):
    """The zero-upload path (FlatSink: flat arrays written on device from
    the model phase's batches) must produce the same fusion output as the
    host-upload fallback fed the same probabilities."""
    import jax.numpy as jnp

    from pointstowood_tpu.predict.tpu_fusion import (
        FlatSink, fuse_on_device, layout_from_batches, plan_fusion,
    )

    tiles, order, classified_xyz, query_xyz, cfg = tiled_cloud
    batcher = TileBatcher(
        tiles, batch_size=4, min_pts=cfg.min_pts, max_pts=cfg.max_pts
    )

    def prob_of(xyz):  # deterministic pseudo-model output
        return (1 / (1 + np.exp(
            (np.linalg.norm(xyz[:, :2] - 3.0, axis=1) - 0.4) * 4
        ))).astype(np.float32)

    # simulate run_inference's sink writes with the batch's device arrays
    sink = FlatSink(layout_from_batches(tiles, batcher.batch_plan(),
                                        batcher.batch_size_for))
    for cap, batch, _ in batcher:
        world = batch.pos + batch.shift[:, None, :]
        probs = prob_of(world.reshape(-1, 3)).reshape(world.shape[:2])
        sink.write(jnp.asarray(batch.pos), batch.shift, jnp.asarray(probs))

    plan = plan_fusion(tiles, order, query_xyz, cfg.min_pts, cfg.max_pts,
                       layout=sink.layout)
    fused_sink = fuse_on_device(
        tiles, order, None, query_xyz, 0.5, 1.0, cfg.min_pts, cfg.max_pts,
        plan=plan, resident=sink.arrays(),
    )

    tight_probs = prob_of(classified_xyz.astype(np.float32))
    fused_host = fuse_on_device(
        tiles, order, tight_probs, query_xyz, 0.5, 1.0,
        cfg.min_pts, cfg.max_pts,
    )
    assert fused_sink is not None and fused_host is not None
    np.testing.assert_array_equal(fused_sink[:, 0], fused_host[:, 0])
    np.testing.assert_allclose(fused_sink[:, 1], fused_host[:, 1],
                               atol=1e-6)


def test_query_slots_inverts_perm(tiled_cloud):
    """query_slots() is the exact inverse of the plan's slot->query perm:
    a gather through it must reproduce the scatter semantics it replaced
    (duplicate slots for one query pick the later slot; rows no dispatch
    covers map to the zero pad slot == n_slots)."""
    from pointstowood_tpu.predict.tpu_fusion import plan_fusion

    tiles, order, _, query_xyz, cfg = tiled_cloud
    # append a non-finite query row: it must map to the pad slot
    q = np.vstack([query_xyz, [[np.nan, np.nan, np.nan]]])
    plan = plan_fusion(tiles, order, q, cfg.min_pts, cfg.max_pts)
    assert plan is not None
    slots = plan.query_slots()
    assert slots.shape == (plan.n_q,)
    assert slots[-1] == plan.n_slots  # NaN row: uncovered -> pad slot
    covered = slots < plan.n_slots
    # every covered row's slot maps straight back to it...
    np.testing.assert_array_equal(
        plan.perm[slots[covered]], np.flatnonzero(covered)
    )
    # ...choosing the LAST slot where a query owns several (the scatter
    # this replaced wrote later slots over earlier ones)
    vm = plan.perm >= 0
    last = {}
    for slot in np.flatnonzero(vm):
        last[int(plan.perm[slot])] = slot
    for qrow, slot in last.items():
        assert slots[qrow] == slot
    # and every valid perm entry is covered
    assert set(plan.perm[vm].tolist()) == set(np.flatnonzero(covered).tolist())


def test_fine_cap_set_outputs_identical(tiled_cloud, monkeypatch):
    """The local-regime three-cap set changes only dispatch SHAPES: a
    larger cap pads the masked candidate scan, never its contents, so
    fusion output must be bit-identical to the two-cap relay set
    (VERDICT r4 item 4: shape-correctness of the padding lever validated
    in the CPU suite)."""
    from pointstowood_tpu.predict import tpu_fusion as tf

    tiles, order, classified_xyz, query_xyz, cfg = tiled_cloud
    prob = (1 / (1 + np.exp(
        (np.linalg.norm(classified_xyz[:, :2] - 3.0, axis=1) - 0.4) * 4
    ))).astype(np.float32)
    base = tf.fuse_on_device(tiles, order, prob, query_xyz, 0.5, 1.0,
                             cfg.min_pts, cfg.max_pts)
    monkeypatch.setenv("TSP_FUSION_CAPS", "2048,8192,16384")
    monkeypatch.setattr(tf, "_FUSION_CAPS", None)
    tf._PLAN_CACHE.clear()
    fine = tf.fuse_on_device(tiles, order, prob, query_xyz, 0.5, 1.0,
                             cfg.min_pts, cfg.max_pts)
    assert base is not None and fine is not None
    np.testing.assert_array_equal(fine, base)
    tf._PLAN_CACHE.clear()  # plans built under the A/B set must not leak


def test_host_knn_plot_scale_warning():
    """The host kNN tier must warn loudly at plot scale (>= 1e6 queries)
    with a measured cost estimate — a silent scipy fallback at the
    reference's 10^7-row regime costs minutes (VERDICT r4 item 7 /
    BASELINE.md host_fusion_bench)."""
    rng = np.random.default_rng(0)
    src = rng.normal(size=(64, 3)).astype(np.float32)
    q = rng.normal(size=(1_000_000, 3)).astype(np.float32)
    with pytest.warns(RuntimeWarning, match="HOST kNN tier"):
        idx = knn_indices(src, q, 1)
    assert idx.shape == (len(q), 1)
    # below the threshold: silent
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        knn_indices(src, q[:1000], 1)
