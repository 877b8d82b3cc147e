"""Kernel-layer unit tests against numpy/scipy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree
from scipy.special import erfinv

from pointstowood_tpu.ops import (
    compact_indices,
    knn_interpolate,
    knn_masked,
    quantile_normalize,
    radius_masked,
    random_sample,
    voxel_cell_ids,
    voxel_representatives,
)
from pointstowood_tpu.ops.normalization import ground_normalize_np, quantile_normalize_np
from pointstowood_tpu.ops.segment import segment_max, segment_mean, segment_min, segment_sum


# ----------------------------------------------------------------- kNN


def test_knn_matches_kdtree(rng):
    src = rng.normal(size=(500, 3)).astype(np.float32)
    q = rng.normal(size=(100, 3)).astype(np.float32)
    idx, d2, valid = knn_masked(q, src, k=8, chunk_size=128)
    assert valid.all()
    tree = cKDTree(src)
    ref_d, ref_i = tree.query(q, k=8)
    np.testing.assert_allclose(np.sort(np.asarray(d2), 1), np.sort(ref_d**2, 1), rtol=1e-4, atol=1e-5)
    # index sets must agree (tie order may differ)
    assert all(set(map(int, a)) == set(map(int, b)) for a, b in zip(np.asarray(idx), ref_i))


def test_knn_respects_source_mask(rng):
    src = rng.normal(size=(64, 3)).astype(np.float32)
    smask = np.zeros(64, bool)
    smask[:10] = True
    idx, d2, valid = knn_masked(src[:5], src, k=4, source_mask=jnp.array(smask), chunk_size=32)
    assert np.asarray(idx).max() < 10
    tree = cKDTree(src[:10])
    ref_d, ref_i = tree.query(src[:5], k=4)
    np.testing.assert_allclose(np.asarray(d2), ref_d**2, rtol=1e-4, atol=1e-5)


def test_knn_more_k_than_sources(rng):
    src = rng.normal(size=(16, 3)).astype(np.float32)
    smask = np.zeros(16, bool)
    smask[:3] = True
    idx, d2, valid = knn_masked(src[:2], src, k=8, source_mask=jnp.array(smask), chunk_size=8)
    assert np.asarray(valid).sum(axis=1).tolist() == [3, 3]


def test_group_min_payload_carries_probability(rng):
    """The payload-packed group-min kernel (fusion pair path): selected
    values rank like true distances, the low mantissa bits decode to the
    winning source's quantized payload, and masked sources come back as
    >1e38 sentinels (never +inf/NaN)."""
    from pointstowood_tpu.ops import pallas_knn

    n, k = 2048, 32
    src = rng.normal(size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(256, 3)).astype(np.float32)
    prob = rng.random(n).astype(np.float32)
    pmax = float((1 << pallas_knn.PAYLOAD_BITS) - 1)
    pay = np.round(prob * pmax).astype(np.uint32)
    smask = np.ones(n, bool)
    smask[:512] = False
    pen = (src * src).sum(1) + np.where(smask, 0.0, np.inf)
    g = pallas_knn.supported(n, k)
    assert g > 0
    gmin = pallas_knn.group_min_payload(
        jnp.asarray(q), jnp.asarray(src), jnp.asarray(pen),
        jnp.asarray(pay), g,
    )
    vals, _ = jax.lax.approx_min_k(gmin, k, recall_target=0.95)
    vals = np.asarray(vals)
    assert np.isfinite(vals).all() and (vals < 1e38).all()
    got_p = np.asarray(pallas_knn.unpack_payload(jnp.asarray(vals))) / pmax
    # oracle: exact kNN over the valid sources; the payload of each
    # selected value must match SOME true near neighbor's probability
    # (grouped selection may swap boundary ties)
    tree = cKDTree(src[512:])
    _, ref_i = tree.query(q, k=k + 8)
    ref_probs = prob[512:][ref_i]  # (Q, k+8)
    match = np.isclose(
        got_p[:, :, None], ref_probs[:, None, :], atol=0.6 / pmax
    ).any(axis=2)
    assert match.mean() > 0.95, f"payload match rate {match.mean()}"
    # all-masked sources: sentinel clamp, never selected as valid
    pen_all = np.full(n, np.inf, np.float32)
    pen_all = (src * src).sum(1) + pen_all
    gm2 = pallas_knn.group_min_payload(
        jnp.asarray(q), jnp.asarray(src), jnp.asarray(pen_all),
        jnp.asarray(pay), g,
    )
    assert bool((np.asarray(gm2) > 1e38).all())


def test_knn_query_mask(rng):
    src = rng.normal(size=(32, 3)).astype(np.float32)
    qmask = np.array([True, False])
    _, _, valid = knn_masked(src[:2], src, k=4, query_mask=jnp.array(qmask), chunk_size=16)
    assert valid[0].all() and not valid[1].any()


def test_knn_fast_pallas_path(rng):
    """method='fast' (Pallas group-min kernel, interpreter on CPU): high
    recall vs the KD-tree, masked sources never selected, and fallback to
    the approx path below the kernel's shape floor."""
    src = rng.normal(size=(2048, 3)).astype(np.float32)
    q = rng.normal(size=(300, 3)).astype(np.float32)
    idx, d2, valid = knn_masked(q, src, k=32, method="fast")
    assert bool(np.asarray(valid).all())
    tree = cKDTree(src)
    _, ref_i = tree.query(q, k=32)
    hits = sum(
        len(set(map(int, a)) & set(map(int, b)))
        for a, b in zip(np.asarray(idx), ref_i)
    )
    assert hits / (300 * 32) > 0.9  # grouped selection: ~1-3% collisions
    # masked sources are never selected (the +inf penalty survives
    # slot-packing bit-exactly)
    smask = np.ones(2048, bool)
    smask[:1024] = False
    idx2, _, v2 = knn_masked(
        q, src, k=32, source_mask=jnp.array(smask), method="fast"
    )
    sel = np.asarray(idx2)[np.asarray(v2)]
    assert sel.min() >= 1024 and np.asarray(v2).all()
    # below the kernel floor the approx fallback keeps exact CPU semantics
    idx3, _, v3 = knn_masked(q[:10], src[:500], k=8, method="fast")
    ref_d3, ref_i3 = tree.__class__(src[:500]).query(q[:10], k=8)
    assert all(
        set(map(int, a)) == set(map(int, b))
        for a, b in zip(np.asarray(idx3), ref_i3)
    )


def test_knn_fast_inkernel_topk_multislice(rng):
    """group_min_topk with a multi-slice second fold (n=4096 -> npg=512,
    fold=256, 2 slices): high recall vs the KD-tree, per-row indices
    distinct, masked sources never valid, all-masked tiles come back
    fully invalid (the finite _TOPK_BIG clamp must not leak as valid)."""
    from pointstowood_tpu.ops import pallas_knn

    assert pallas_knn.topk_supported(4096, 32) == 8
    src = rng.normal(size=(4096, 3)).astype(np.float32)
    q = rng.normal(size=(300, 3)).astype(np.float32)
    idx, d2, valid = knn_masked(q, src, k=32, method="fast")
    assert bool(np.asarray(valid).all())
    tree = cKDTree(src)
    _, ref_i = tree.query(q, k=32)
    ia = np.asarray(idx)
    hits = sum(
        len(set(map(int, a)) & set(map(int, b))) for a, b in zip(ia, ref_i)
    )
    assert hits / (300 * 32) > 0.9
    # extraction must never emit the same source twice for one query
    assert all(len(set(map(int, row))) == 32 for row in ia)
    # all-masked sources: every slot invalid, no NaN/garbage validity
    none = np.zeros(4096, bool)
    _, d2m, vm = knn_masked(q, src, k=32, source_mask=jnp.array(none),
                            method="fast")
    assert not bool(np.asarray(vm).any())
    assert bool(np.isinf(np.asarray(d2m)).all())


def test_knn_topk_fold_override(rng):
    """group_min_topk's explicit fold override (n=4096, g=8, fold=128 ->
    4 slices vs the default 256 -> 2): both folds give high recall and
    identical nearest neighbors; invalid folds are rejected."""
    import pytest
    from pointstowood_tpu.ops import pallas_knn

    n, k = 4096, 32
    g = pallas_knn.topk_supported(n, k)
    src = rng.normal(size=(n, 3)).astype(np.float32)
    q = jnp.asarray(src[: pallas_knn.QUERY_BLOCK])
    pen = jnp.sum(jnp.square(jnp.asarray(src)), axis=1)
    tree = cKDTree(src)
    _, ref_i = tree.query(src[: pallas_knn.QUERY_BLOCK], k=k)
    nearest = {}
    for fold in (256, 128):
        vals, idx = pallas_knn.group_min_topk(
            q, jnp.asarray(src), pen, g, k, fold=fold)
        ia = np.asarray(idx)
        hits = sum(len(set(map(int, a)) & set(map(int, b)))
                   for a, b in zip(ia, ref_i))
        assert hits / ia.size > 0.95, fold
        order = np.argsort(np.asarray(vals), axis=1)
        nearest[fold] = np.take_along_axis(ia, order[:, :1], axis=1)
    # the true nearest neighbor survives any fold (it wins its column)
    np.testing.assert_array_equal(nearest[256], nearest[128])
    with pytest.raises(AssertionError):
        pallas_knn.group_min_topk(q, jnp.asarray(src), pen, g, k, fold=96)


def test_knn_fast_top2(rng):
    """k=2 on the fast path runs the in-kernel folded top-2 (the
    FP-interpolation case): the nearest neighbor is always exact; the
    runner-up may fall to the 3rd-nearest for ~1/256 of queries (group
    fold collision); masked sources are never chosen."""
    src = rng.normal(size=(2048, 3)).astype(np.float32)
    q = rng.normal(size=(300, 3)).astype(np.float32)
    idx, d2, valid = knn_masked(q, src, k=2, method="fast")
    assert bool(np.asarray(valid).all())
    tree = cKDTree(src)
    ref_d, ref_i = tree.query(q, k=2)
    got_d = np.sort(np.asarray(d2), 1)
    # nearest neighbor exact for every query
    np.testing.assert_allclose(got_d[:, 0], ref_d[:, 0] ** 2,
                               rtol=1e-3, atol=1e-4)
    # runner-up exact except fold collisions (expected ~300/256 ~ 1.2)
    ok2 = np.isclose(got_d[:, 1], ref_d[:, 1] ** 2, rtol=1e-3, atol=1e-4)
    assert ok2.sum() >= 290
    exact_rows = sum(
        set(map(int, a)) == set(map(int, b))
        for a, b in zip(np.asarray(idx), ref_i)
    )
    assert exact_rows >= 290
    smask = np.ones(2048, bool)
    smask[:1024] = False
    idx2, _, v2 = knn_masked(
        q, src, k=2, source_mask=jnp.array(smask), method="fast"
    )
    assert bool(np.asarray(v2).all())
    assert np.asarray(idx2)[np.asarray(v2)].min() >= 1024


def test_radius_masks_far_points(rng):
    src = rng.uniform(0, 10, size=(300, 3)).astype(np.float32)
    q = src[:50]
    r = 1.0
    idx, d2, valid = radius_masked(q, src, radius=r, k=16, chunk_size=64)
    v, i, d = np.asarray(valid), np.asarray(idx), np.asarray(d2)
    assert (d[v] <= r**2 + 1e-6).all()
    # every query includes itself (distance 0)
    self_found = [(i[row][v[row]] == row).any() for row in range(50)]
    assert all(self_found)
    tree = cKDTree(src)
    for row in range(10):
        ref = tree.query_ball_point(q[row], r)
        got = set(i[row][v[row]].tolist())
        if len(ref) <= 16:
            assert got == set(ref)
        else:
            assert got.issubset(set(ref)) and len(got) == 16


# ----------------------------------------------------------------- voxel


def test_voxel_representatives_one_per_cell(rng):
    pos = rng.uniform(0, 2, size=(200, 3)).astype(np.float32)
    ids = voxel_cell_ids(jnp.array(pos), 0.25)
    idx, valid = voxel_representatives(ids, capacity=200)
    ids_np = np.asarray(ids)
    reps = np.asarray(idx)[np.asarray(valid)]
    # exactly one representative per occupied cell, each a member of it
    rep_cells = ids_np[reps]
    assert len(set(rep_cells.tolist())) == len(reps)
    assert set(rep_cells.tolist()) == set(ids_np.tolist())
    # deterministic across calls
    idx2, _ = voxel_representatives(ids, capacity=200)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


def test_voxel_representatives_masked_and_overflow(rng):
    pos = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
    mask = np.ones(64, bool)
    mask[32:] = False
    ids = voxel_cell_ids(jnp.array(pos), 0.01, mask=jnp.array(mask))  # all distinct cells
    idx, valid = voxel_representatives(ids, capacity=16, mask=jnp.array(mask))
    assert np.asarray(valid).sum() == 16
    assert np.asarray(idx).max() < 32  # only valid points
    kept = np.asarray(idx)
    assert len(set(kept.tolist())) == 16  # distinct cells kept
    # overflow subset is hash-ordered, not index-ordered (spatially unbiased:
    # the kept set must not be the first 16 indices)
    assert set(kept.tolist()) != set(range(16))


def test_check_voxel_pack_range():
    """A user-controlled grid_size that would alias the packed cell ids must
    raise up front instead of silently corrupting the eval sampling (VERDICT
    round-1 weak #5: 50 m tiles at 0.04 m SA1 resolution exceed 2^10 cells)."""
    import pytest

    from pointstowood_tpu.ops.voxel import check_voxel_pack_range

    check_voxel_pack_range(6.0, 0.04)  # canonical configs are fine
    check_voxel_pack_range(40.0, 0.04)  # exactly 1000 cells: fine
    with pytest.raises(ValueError, match="voxel sampling grid overflow"):
        check_voxel_pack_range(50.0, 0.04)


def test_run_inference_rejects_aliasing_grid():
    import pytest

    from pointstowood_tpu.config import ModelConfig, PredictConfig, TilingConfig
    from pointstowood_tpu.data.tiling import Tile
    from pointstowood_tpu.predict.predicter import build_net, run_inference

    tiles = [Tile(points=np.zeros((4, 4), np.float32), grid_size=50.0)]
    net = build_net(ModelConfig())
    with pytest.raises(ValueError, match="voxel sampling grid overflow"):
        run_inference(
            tiles, {}, net, PredictConfig(),
            TilingConfig(grid_size=(50.0,), min_pts=1, max_pts=64),
        )


# ----------------------------------------------------------------- sampling


def test_compact_indices():
    sel = jnp.array([False, True, False, True, True, False])
    idx, valid = compact_indices(sel, capacity=4)
    assert idx.tolist()[:3] == [1, 3, 4]
    assert valid.tolist() == [True, True, True, False]


def test_random_sample_half(rng):
    mask = np.ones(100, bool)
    mask[80:] = False
    idx, valid = random_sample(jax.random.key(0), jnp.array(mask), capacity=50)
    v = np.asarray(valid)
    assert v.sum() == 40  # floor(80 * 0.5)
    chosen = np.asarray(idx)[v]
    assert (chosen < 80).all() and len(set(chosen.tolist())) == 40
    # ascending (reference sorts sampled indices)
    assert (np.diff(chosen) > 0).all()
    # different keys give different draws
    idx2, _ = random_sample(jax.random.key(1), jnp.array(mask), capacity=50)
    assert not np.array_equal(np.asarray(idx), np.asarray(idx2))


# ----------------------------------------------------------------- interpolate


def test_knn_interpolate_oracle(rng):
    src = rng.normal(size=(40, 3)).astype(np.float32)
    x = rng.normal(size=(40, 5)).astype(np.float32)
    tgt = rng.normal(size=(20, 3)).astype(np.float32)
    out = knn_interpolate(jnp.array(x), jnp.array(src), jnp.array(tgt), k=2, chunk_size=16)
    tree = cKDTree(src)
    d, i = tree.query(tgt, k=2)
    w = 1.0 / np.maximum(d**2, 1e-16)
    ref = (x[i] * w[..., None]).sum(1) / w.sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_knn_interpolate_single_source():
    # FP4 case: one global vector per sample broadcast to all targets.
    src = np.zeros((8, 3), np.float32)
    smask = np.zeros(8, bool)
    smask[0] = True
    x = np.tile(np.arange(4, dtype=np.float32), (8, 1))
    x[0] = [1, 2, 3, 4]
    tgt = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    out = knn_interpolate(jnp.array(x), jnp.array(src), jnp.array(tgt), k=2,
                          source_mask=jnp.array(smask), chunk_size=8)
    np.testing.assert_allclose(np.asarray(out), np.tile([1, 2, 3, 4], (5, 1)), rtol=1e-5)


# ----------------------------------------------------------------- normalization


def test_quantile_normalize_np_properties(rng):
    r = rng.normal(size=1000).astype(np.float32) * 5 + 3
    out = quantile_normalize_np(r)
    assert out.min() == -1.0 and out.max() == 1.0
    # rank order preserved
    assert (np.argsort(out, kind="stable") == np.argsort(r, kind="stable")).all()
    # matches the erfinv formula directly
    ranks = np.argsort(np.argsort(r, kind="stable"), kind="stable")
    q = np.clip((ranks + 1) / (len(r) + 1), 1e-7, 1 - 1e-7)
    z = erfinv(2 * q - 1) * np.sqrt(2)
    ref = 2 * (z - z.min()) / (z.max() - z.min()) - 1
    # implementation is fp32 (faithful to the torch reference); oracle is fp64
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-5)


def test_quantile_normalize_jnp_matches_np(rng):
    r = rng.normal(size=257).astype(np.float32)
    out = np.asarray(quantile_normalize(jnp.array(r)))
    ref = quantile_normalize_np(r)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_quantile_normalize_masked(rng):
    r = rng.normal(size=64).astype(np.float32)
    mask = np.ones(64, bool)
    mask[40:] = False
    out = np.asarray(quantile_normalize(jnp.array(r), mask=jnp.array(mask)))
    ref = quantile_normalize_np(r[:40])
    np.testing.assert_allclose(out[:40], ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(out[40:], 0.0)


def test_ground_normalize(rng):
    # two 5m cells with distinct floors
    n = 200
    x = np.concatenate([rng.uniform(0, 4, n), rng.uniform(6, 9, n)])
    y = np.ones(2 * n)
    z = np.concatenate([rng.uniform(10, 20, n), rng.uniform(100, 110, n)])
    nz = ground_normalize_np(np.stack([x, y, z], 1))
    np.testing.assert_allclose(nz[:n], z[:n] - z[:n].min(), rtol=1e-6)
    np.testing.assert_allclose(nz[n:], z[n:] - z[n:].min(), rtol=1e-6)
    assert (nz >= 0).all()


# ----------------------------------------------------------------- segments


def test_segment_ops(rng):
    data = rng.normal(size=(10, 3)).astype(np.float32)
    ids = jnp.array([0, 0, 1, 1, 1, 2, 2, 3, 3, 3])
    mask = jnp.array([True] * 9 + [False])
    mx = np.asarray(segment_max(jnp.array(data), ids, 5, mask=mask))
    np.testing.assert_allclose(mx[0], data[:2].max(0), rtol=1e-6)
    np.testing.assert_allclose(mx[3], data[7:9].max(0), rtol=1e-6)  # masked row excluded
    np.testing.assert_array_equal(mx[4], 0.0)  # empty segment
    mn = np.asarray(segment_min(jnp.array(data), ids, 5, mask=mask))
    np.testing.assert_allclose(mn[1], data[2:5].min(0), rtol=1e-6)
    sm = np.asarray(segment_sum(jnp.array(data), ids, 5, mask=mask))
    np.testing.assert_allclose(sm[3], data[7:9].sum(0), rtol=1e-5)
    mean = np.asarray(segment_mean(jnp.array(data), ids, 5, mask=mask))
    np.testing.assert_allclose(mean[2], data[5:7].mean(0), rtol=1e-5)


def test_knn_interpolate_batched_matches_single(rng):
    from pointstowood_tpu.ops.interpolate import knn_interpolate_batched

    b, s, t, c = 3, 40, 25, 6
    x = rng.normal(size=(b, s, c)).astype(np.float32)
    src = rng.normal(size=(b, s, 3)).astype(np.float32)
    tgt = rng.normal(size=(b, t, 3)).astype(np.float32)
    smask = np.ones((b, s), bool)
    smask[1, 30:] = False
    tmask = np.ones((b, t), bool)
    out = np.asarray(knn_interpolate_batched(
        jnp.array(x), jnp.array(src), jnp.array(tgt), k=2,
        source_mask=jnp.array(smask), target_mask=jnp.array(tmask),
        chunk_size=16,
    ))
    for i in range(b):
        single = np.asarray(knn_interpolate(
            jnp.array(x[i]), jnp.array(src[i]), jnp.array(tgt[i]), k=2,
            source_mask=jnp.array(smask[i]), target_mask=jnp.array(tmask[i]),
            chunk_size=16,
        ))
        np.testing.assert_allclose(out[i], single, rtol=1e-5, atol=1e-6)


def test_fused_fp_interpolate_matches_exact(rng):
    """The fused threshold-select interpolation kernel (ops/pallas_interp)
    matches exact k=2 inverse-distance interpolation on almost all rows
    (deviations only at top2 fold-collision rows, ~1/TOP2_GROUPS), zeroes
    invalid targets, and its custom VJP matches the exact path's gradient
    to the same tolerance. Runs through the Pallas interpreter on CPU."""
    from pointstowood_tpu.ops import pallas_interp
    from pointstowood_tpu.ops.interpolate import knn_interpolate_batched

    b, s, t, c = 2, 2048, 512, 128
    assert pallas_interp.fused_supported(t, s, c)
    x = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 1, (b, s, 3)).astype(np.float32))
    tpos = jnp.asarray(rng.uniform(-1, 1, (b, t, 3)).astype(np.float32))
    smask = np.ones((b, s), bool)
    smask[:, -64:] = False
    smask = jnp.asarray(smask)

    y_f = np.asarray(pallas_interp.fp_interpolate_fast(x, pos, tpos, smask))
    y_e = np.asarray(knn_interpolate_batched(
        x, pos, tpos, k=2, source_mask=smask, method="exact"))
    dev = np.abs(y_f - y_e).max(axis=-1) / (np.abs(y_e).max(axis=-1) + 1e-3)
    assert (dev > 0.02).mean() < 0.02, (dev > 0.02).mean()

    # gradient parity vs the exact path (cotangent projection)
    ct = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    gf = jax.grad(lambda x: jnp.sum(
        pallas_interp.fp_interpolate_fast(x, pos, tpos, smask) * ct))(x)
    ge = jax.grad(lambda x: jnp.sum(knn_interpolate_batched(
        x, pos, tpos, k=2, source_mask=smask, method="exact") * ct))(x)
    gf, ge = np.asarray(gf), np.asarray(ge)
    assert np.abs(gf - ge).sum() / np.abs(ge).sum() < 0.03

    # all-masked sources -> zero output (the padded-tile chain)
    none = jnp.asarray(np.zeros((b, s), bool))
    y0 = pallas_interp.fp_interpolate_fast(x, pos, tpos, none)
    assert float(jnp.abs(y0).max()) == 0.0


def test_gather_rows_deadtail_grads(rng):
    """gather_rows_deadtail: identical forward to gather_rows; its VJP
    scatters only the feature head (identical head gradient) and returns
    exactly zero for the declared-dead geometry tail."""
    import jax

    from pointstowood_tpu.model.pointconv import (
        gather_rows,
        gather_rows_deadtail,
    )

    b, n, e, c, tail = 2, 64, 37, 12, 4
    arr = jnp.asarray(rng.normal(size=(b, n, c + tail)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, e, 3)).astype(np.int32))
    ct = jnp.asarray(
        rng.normal(size=(b, e, 3, c + tail)).astype(np.float32))

    fwd_a = np.asarray(gather_rows_deadtail(arr, idx, tail=tail))
    fwd_b = np.asarray(gather_rows(arr, idx))
    np.testing.assert_array_equal(fwd_a, fwd_b)

    g_dead = jax.grad(lambda a: jnp.sum(
        gather_rows_deadtail(a, idx, tail=tail) * ct))(arr)
    g_full = jax.grad(lambda a: jnp.sum(gather_rows(a, idx) * ct))(arr)
    g_dead, g_full = np.asarray(g_dead), np.asarray(g_full)
    np.testing.assert_allclose(
        g_dead[..., :c], g_full[..., :c], rtol=1e-6, atol=1e-6)
    assert np.all(g_dead[..., c:] == 0.0)
    assert np.any(g_full[..., c:] != 0.0)  # the tail grad really was live

    # tail=0 degrades to the plain gather (full gradient)
    g0 = np.asarray(jax.grad(lambda a: jnp.sum(
        gather_rows_deadtail(a, idx, tail=0) * ct))(arr))
    np.testing.assert_allclose(g0, g_full, rtol=1e-6, atol=1e-6)


def test_knn_interpolate_batched_bf16_packed(rng):
    """The packed-bf16 gather path (feats bf16 + hi/lo position pairs)
    matches the fp32 gather path within bf16 tolerance, and feature
    gradients flow (in bf16) with the same structure."""
    import jax

    from pointstowood_tpu.ops.interpolate import knn_interpolate_batched

    b, s, t, c = 2, 64, 48, 8
    x32 = rng.normal(size=(b, s, c)).astype(np.float32)
    src = rng.uniform(-2, 2, (b, s, 3)).astype(np.float32)
    tgt = np.concatenate(
        [src[:, : t // 2], rng.uniform(-2, 2, (b, t - t // 2, 3))], axis=1
    ).astype(np.float32)  # half the targets coincide with sources
    smask = np.ones((b, s), bool)
    smask[1, -10:] = False

    args = dict(k=2, source_mask=jnp.asarray(smask), chunk_size=16,
                method="exact")
    y32 = np.asarray(knn_interpolate_batched(
        jnp.asarray(x32), jnp.asarray(src), jnp.asarray(tgt), **args))
    x16 = jnp.asarray(x32).astype(jnp.bfloat16)
    y16 = np.asarray(knn_interpolate_batched(
        x16, jnp.asarray(src), jnp.asarray(tgt), **args)).astype(np.float32)
    scale = np.abs(y32).max()
    np.testing.assert_allclose(y16, y32, atol=0.03 * scale)

    g16 = jax.grad(lambda xx: jnp.sum(knn_interpolate_batched(
        xx, jnp.asarray(src), jnp.asarray(tgt), **args
    ).astype(jnp.float32)))(x16)
    g32 = jax.grad(lambda xx: jnp.sum(knn_interpolate_batched(
        xx, jnp.asarray(src), jnp.asarray(tgt), **args)))(jnp.asarray(x32))
    g16 = np.asarray(g16).astype(np.float32)
    g32 = np.asarray(g32)
    gs = np.abs(g32).max()
    np.testing.assert_allclose(g16, g32, atol=0.05 * gs)


def test_knn_topk_with_transpose(rng):
    """The fused transpose kernel (ops/knn.knn_topk_with_transpose): the
    stage's own neighbors come back bit-identical to the plain fast path,
    and the per-source transpose top-2 matches a brute-force oracle of
    "nearest-2 valid queries" exactly (up to packed-bits near-ties),
    with validity mirroring the source mask / all-queries-masked cases.

    This is the FP decoder's k=2 interpolation search (reference
    model.py:149) folded into the SA stage's kNN kernel
    (pallas_knn.group_min_topk_t) — d(p, c) is symmetric so FP_i's
    search IS SA_i's kNN transposed."""
    from pointstowood_tpu.ops import pallas_knn
    from pointstowood_tpu.ops.knn import knn_topk_with_transpose

    b, q_n, n, k = 2, 512, 2048, 32
    q = rng.normal(size=(b, q_n, 3)).astype(np.float32)
    src = rng.normal(size=(b, n, 3)).astype(np.float32)
    smask = rng.random((b, n)) > 0.1
    qmask = rng.random((b, q_n)) > 0.15
    g = pallas_knn.transpose_supported(q_n, n, k)
    assert g
    idx, valid, t_idx, t_valid = knn_topk_with_transpose(
        jnp.asarray(q), jnp.asarray(src), k,
        jnp.asarray(qmask), jnp.asarray(smask))

    # forward outputs bit-identical to the plain group_min_topk path
    pen = (src ** 2).sum(-1) + np.where(smask, 0.0, np.inf)
    v2, i2 = jax.vmap(
        lambda a, c, p: pallas_knn.group_min_topk(a, c, p, g, k)
    )(jnp.asarray(q), jnp.asarray(src), jnp.asarray(pen.astype(np.float32)))
    ref_valid = (np.asarray(v2) < 1e38) & qmask[:, :, None]
    assert np.array_equal(np.asarray(valid), ref_valid)
    assert np.array_equal(
        np.asarray(idx)[ref_valid], np.asarray(i2)[ref_valid])

    # transpose top-2 vs oracle over valid queries only
    d = ((src[:, None, :, :] - q[:, :, None, :]) ** 2).sum(-1)  # (B,Q,N)
    d = np.where(qmask[:, :, None], d, np.inf)
    t_oracle = np.argsort(d, axis=1)[:, :2, :].transpose(0, 2, 1)
    assert np.array_equal(
        np.asarray(t_valid), np.repeat(smask[..., None], 2, -1))
    for sl in range(2):
        mine = np.asarray(t_idx)[..., sl][smask]
        ref = t_oracle[..., sl][smask]
        agree = mine == ref
        assert agree.mean() > 0.995  # packed-bits near-ties only
        # every disagreement is a distance near-tie
        bad = np.argwhere((np.asarray(t_idx)[..., sl] != t_oracle[..., sl])
                          & smask)
        for bb, nn_ in bad:
            dm = d[bb, np.asarray(t_idx)[bb, nn_, sl], nn_]
            do = d[bb, t_oracle[bb, nn_, sl], nn_]
            assert abs(dm - do) <= 2e-3 * max(do, 1e-6)

    # all queries masked -> every transpose slot invalid
    _, _, _, tv0 = knn_topk_with_transpose(
        jnp.asarray(q), jnp.asarray(src), k,
        jnp.zeros((b, q_n), bool), jnp.asarray(smask))
    assert not bool(np.asarray(tv0).any())


def test_knn_interpolate_precomputed_transpose(rng):
    """knn_interpolate_batched(precomputed=...) with the SA transpose
    neighbors matches the search-based exact path (values, not indices —
    near-tie slots may differ) and ignores precomputed when the fused
    kernel takes the stage."""
    from pointstowood_tpu.ops.interpolate import knn_interpolate_batched
    from pointstowood_tpu.ops.knn import knn_topk_with_transpose

    b, q_n, n, c = 2, 512, 2048, 8
    centers = rng.normal(size=(b, q_n, 3)).astype(np.float32)
    pts = rng.normal(size=(b, n, 3)).astype(np.float32)
    smask = np.ones((b, n), bool)
    smask[1, -100:] = False
    qmask = np.ones((b, q_n), bool)
    qmask[0, -50:] = False
    x = rng.normal(size=(b, q_n, c)).astype(np.float32)

    _, _, t_idx, t_valid = knn_topk_with_transpose(
        jnp.asarray(centers), jnp.asarray(pts), 32,
        jnp.asarray(qmask), jnp.asarray(smask))
    y_pre = np.asarray(knn_interpolate_batched(
        jnp.asarray(x), jnp.asarray(centers), jnp.asarray(pts), k=2,
        source_mask=jnp.asarray(qmask), target_mask=jnp.asarray(smask),
        method="fast", fused_max_sources=0,  # force the gather path
        precomputed=(t_idx, t_valid)))
    y_ref = np.asarray(knn_interpolate_batched(
        jnp.asarray(x), jnp.asarray(centers), jnp.asarray(pts), k=2,
        source_mask=jnp.asarray(qmask), target_mask=jnp.asarray(smask),
        method="exact"))
    # identical neighbor sets except packed near-ties: compare values
    err = np.abs(y_pre - y_ref)[smask]
    assert np.quantile(err, 0.999) < 1e-4 * max(np.abs(y_ref).max(), 1.0)
