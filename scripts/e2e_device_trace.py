#!/usr/bin/env python3
"""Device-time ground truth for ONE WARM plot pass: traces a full
semantic_segmentation (model + on-device fusion) and rolls up XLA op
time into model-forward vs fusion-pair vs other. The phase wall timers
mislead here: model dispatches are async, so their device time drains
inside the fusion phase's blocking readback.

Usage: python scripts/e2e_device_trace.py  (real TPU; ~4 min)
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

N_POINTS = int(os.environ.get("E2E_POINTS", 1_000_000))


def main():
    import bench
    import pandas as pd
    import jax

    from pointstowood_tpu.config import ModelConfig, PredictConfig, TilingConfig
    from pointstowood_tpu.data.tiling import preprocess_cloud
    from pointstowood_tpu.io.loader import canonicalize_columns
    from pointstowood_tpu.predict.predicter import semantic_segmentation
    from pointstowood_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
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
    model_cfg = ModelConfig()
    predict_cfg = PredictConfig()
    tiles = preprocess_cloud(pc, tiling_cfg)

    import functools
    import jax.numpy as jnp
    from pointstowood_tpu.model import Net

    net = Net(dtype=jnp.bfloat16)
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, jnp.zeros((1, 256, 3)),
        jnp.zeros((1, 256)), jnp.ones((1, 256), bool), jnp.ones((1,)))

    # cold pass compiles everything
    t0 = time.perf_counter()
    semantic_segmentation(pc.copy(), tiles, variables, model_cfg,
                          predict_cfg, tiling_cfg, verbose=False)
    print(f"cold pass: {time.perf_counter() - t0:.1f}s", flush=True)

    tmpdir = tempfile.mkdtemp(prefix="e2e_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tmpdir):
        semantic_segmentation(pc.copy(), tiles, variables, model_cfg,
                              predict_cfg, tiling_cfg, verbose=True)
    wall = time.perf_counter() - t0
    print(f"warm traced pass: {wall:.2f}s "
          f"({N_POINTS / wall:,.0f} pts/s)", flush=True)

    files = glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace found under", tmpdir)
        return
    with gzip.open(max(files, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    op_tids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            if "XLA Ops" in ev.get("args", {}).get("name", ""):
                op_tids.add((ev.get("pid"), ev.get("tid")))

    def phase_of(ev):
        name = ev.get("name", "?").lower()
        args = ev.get("args", {}) or {}
        src = (str(args.get("tf_op", "")) + " "
               + str(args.get("name", ""))).lower()
        blob = name + " " + src
        if "pair" in blob or "group_min_payload" in blob:
            return "fusion-pair"
        if "sink_write" in blob:
            return "flat-sink"
        if "top2" in blob or "interp" in blob:
            return "model-fwd"
        return "model-fwd" if "forward" in blob or "net" in blob else "?"

    per_phase = collections.Counter()
    per_op = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        dur = ev.get("dur", 0) / 1000.0
        per_op[ev.get("name", "?")] += dur
        per_phase[phase_of(ev)] += dur
        total += dur
    print(f"\ndevice total: {total:.0f} ms over the warm pass "
          f"(wall {wall * 1e3:.0f} ms -> device busy "
          f"{total / (wall * 1e3) * 100:.0f}%)")
    for ph, ms in per_phase.most_common():
        print(f"  {ph:12s} {ms:8.1f} ms")
    print("\n-- top 30 ops --")
    for name, ms in per_op.most_common(30):
        print(f"{ms:8.1f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
