#!/usr/bin/env python3
"""Per-op device-time breakdown of the warm fusion phase (the 92-dispatch
pair-kernel loop) at the canonical 1M-pt plot shape, plus per-combo
wall timings. Finds where the ~1.0 s compute+readback goes: the Pallas
group-min matmuls, the approx_min_k stage-2, the median sort, or the
accumulate/readback.

Usage: python scripts/fusion_trace_probe.py  (real TPU)
"""

import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

N_POINTS = int(os.environ.get("FTP_POINTS", 1_000_000))


def categorize(name):
    n = name.lower()
    if "sort" in n:
        return "sort"
    if "gather" in n or "dynamic-slice" in n:
        return "gather/slice"
    if "dynamic-update-slice" in n:
        return "acc-update"
    if "fusion" in n:
        return "fused-elementwise"
    if "custom-call" in n or "tpu_custom_call" in n:
        return "pallas-groupmin"
    if "partialreduce" in n or "approx" in n:
        return "amk"
    if "reduce" in n:
        return "reduce"
    if "convolution" in n or "dot" in n:
        return "matmul"
    if any(t in n for t in ("copy", "bitcast", "convert", "reshape",
                            "transpose", "pad", "slice", "concatenate")):
        return "format"
    return "other"


def main():
    import bench
    import pandas as pd

    from pointstowood_tpu.config import PredictConfig, TilingConfig
    from pointstowood_tpu.data.dataset import TileBatcher
    from pointstowood_tpu.data.tiling import preprocess_cloud
    from pointstowood_tpu.io.loader import canonicalize_columns
    from pointstowood_tpu.predict import tpu_fusion as tf

    rng = np.random.default_rng(7)
    pts_per_tree = 25_000
    n_trees = max(N_POINTS // pts_per_tree, 1)
    side = max(np.sqrt(n_trees / 0.1), 4.0)
    xs, rs = [], []
    for _ in range(n_trees):
        xyz, refl = bench.tree_points(rng, pts_per_tree, height=8.0)
        off = np.array([rng.uniform(0, side), rng.uniform(0, side), 0.0],
                       np.float32)
        xs.append(xyz + off)
        rs.append(refl)
    df = pd.DataFrame({
        "x": np.concatenate(xs)[:, 0], "y": np.concatenate(xs)[:, 1],
        "z": np.concatenate(xs)[:, 2],
        "scalar_Refl": np.concatenate(rs),
    })
    pc, _, _ = canonicalize_columns(df, mode="predict")
    tiling_cfg = TilingConfig()
    predict_cfg = PredictConfig()
    tiles = preprocess_cloud(pc, tiling_cfg)
    batcher = TileBatcher(tiles, batch_size=predict_cfg.batch_size,
                          min_pts=tiling_cfg.min_pts,
                          max_pts=tiling_cfg.max_pts)
    order = batcher.tile_order()
    query_xyz = pc[["x", "y", "z"]].to_numpy()

    t0 = time.perf_counter()
    plan = tf.plan_fusion(tiles, order, query_xyz, tiling_cfg.min_pts,
                          tiling_cfg.max_pts)
    print(f"plan_fusion: {time.perf_counter() - t0:.2f}s, "
          f"{len(plan.dispatches)} dispatches, combos {plan.combos}, "
          f"n_slots {plan.n_slots} nsp {plan.nsp} n_q {plan.n_q}")
    from collections import Counter

    cnt = Counter((d[0], d[1]) for d in plan.dispatches)
    print("dispatches per combo:", dict(cnt))

    probs = np.ascontiguousarray(
        rng.uniform(0, 1, sum(len(tiles[t]) for t in order)).astype(np.float32))
    is_wood, any_wood = predict_cfg.is_wood, predict_cfg.any_wood

    tw = time.perf_counter()
    tf.warm_fuse_on_device(plan, is_wood, any_wood)
    print(f"warm compiles: {time.perf_counter() - tw:.1f}s")

    # one full warm fuse for wall numbers
    t1 = time.perf_counter()
    out = tf.fuse_on_device(tiles, order, probs, query_xyz, is_wood,
                            any_wood, tiling_cfg.min_pts,
                            tiling_cfg.max_pts, verbose=True, plan=plan)
    print(f"fuse_on_device warm wall: {time.perf_counter() - t1:.2f}s")

    # per-combo wall timings (sync per combo via tiny readback)
    lay = plan.layout
    fx = np.zeros((lay.mp, 3), np.float32)
    fpb = np.zeros(lay.mp, np.float32)
    toff = 0
    for t in order:
        o, l = int(lay.off[t]), int(lay.lens[t])
        fx[o:o + l] = tiles[t].points[:, :3]
        fpb[o:o + l] = probs[toff:toff + l]
        toff += l
    flat_xyz = jnp.asarray(fx)
    flat_probs = jnp.asarray(fpb)
    eq = np.zeros((plan.ecap, 3), np.float32)
    vme = plan.extra_perm >= 0
    eq[: plan.extra_perm.size][vme] = (
        query_xyz[plan.extra_perm[vme]].astype(np.float32))
    all_q = jnp.concatenate([flat_xyz, jnp.asarray(eq)], axis=0)
    k_out = 64 if any_wood == 1 else 32

    by_combo = {}
    for d in plan.dispatches:
        by_combo.setdefault((d[0], d[1]), []).append(d)
    # sync baseline
    np.asarray(all_q[0, 0])
    for combo, ds in sorted(by_combo.items()):
        acc = jnp.zeros(plan.nsp, jnp.uint16)
        tc = time.perf_counter()
        for (cap_f, cap_c, base, qoffs, qlens, offf, lenf, offc,
             lenc, _nr) in ds:
            acc = tf._fused_pair_knn(
                acc, all_q, flat_probs, np.int32(base), qoffs, qlens,
                offf, lenf, offc, lenc, jnp.float32(is_wood),
                jnp.float32(any_wood), k_out, any_wood == 1, cap_f, cap_c)
        np.asarray(acc[:8])
        dt = time.perf_counter() - tc
        n_ent = sum(d[3].size for d in ds)
        print(f"combo {combo}: {len(ds)} dispatches ({n_ent} entries) "
              f"{dt * 1e3:7.1f} ms ({dt / n_ent * 1e3:5.2f} ms/entry)")

    # trace one full dispatch loop
    tmpdir = tempfile.mkdtemp(prefix="fusion_trace_")
    acc = jnp.zeros(plan.nsp, jnp.uint16)
    with jax.profiler.trace(tmpdir):
        for (cap_f, cap_c, base, qoffs, qlens, offf, lenf, offc,
             lenc, _nr) in plan.dispatches:
            acc = tf._fused_pair_knn(
                acc, all_q, flat_probs, np.int32(base), qoffs, qlens,
                offf, lenf, offc, lenc, jnp.float32(is_wood),
                jnp.float32(any_wood), k_out, any_wood == 1, cap_f, cap_c)
        packed = np.asarray(acc[: plan.n_slots])
    files = glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace file found under", tmpdir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    op_tids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            if "XLA Ops" in ev.get("args", {}).get("name", ""):
                op_tids.add((ev.get("pid"), ev.get("tid")))
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        dur = ev.get("dur", 0) / 1000.0
        name = ev.get("name", "?")
        per_op[name] += dur
        per_cat[categorize(name)] += dur
        total += dur
    print(f"\ndevice total: {total:.1f} ms over the dispatch loop")
    print("\n-- category rollup --")
    for cat, ms in per_cat.most_common():
        print(f"{cat:20s} {ms:8.1f} ms  {ms / total * 100:5.1f}%")
    print("\n-- top 25 ops --")
    for name, ms in per_op.most_common(25):
        print(f"{ms:8.1f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
