#!/usr/bin/env python3
"""Capture a TPU profiler trace of the canonical train step and print the
per-op cost breakdown, aggregated by op category.

The tensorboard trace converter is broken in this environment (protobuf
mismatch); we parse the raw ``*.trace.json.gz`` directly. The XLA Ops
lane carries one event per HLO op with ``dur`` in microseconds and args
including ``tf_op``/``long_name`` (source attribution).

Usage: TST_B=8 TST_N=16384 python scripts/train_step_trace.py
Prints: top-30 ops by total device time + a category rollup
(scatter / gather / conv-matmul / format(copy,bitcast,convert,reshape,
transpose) / reduce / other).
"""

import collections
import functools
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("TST_B", 8))
N = int(os.environ.get("TST_N", 16384))
ITERS = int(os.environ.get("TST_ITERS", 3))

read = jax.jit(lambda x: jnp.asarray(x, jnp.float32).sum())


def categorize(name):
    n = name.lower()
    if "scatter" in n:
        return "scatter"
    if "gather" in n or "dynamic-slice" in n:
        return "gather"
    if "fusion" in n:
        return "fusion"
    if "convolution" in n or "dot" in n:
        return "matmul"
    if any(t in n for t in ("copy", "bitcast", "convert", "reshape",
                            "transpose", "pad", "slice", "concatenate")):
        return "format"
    if "reduce" in n or "sort" in n:
        return "reduce/sort"
    if "custom-call" in n:
        return "custom-call"
    return "other"


def main():
    from pointstowood_tpu.config import TrainConfig
    from pointstowood_tpu.model import Net
    from pointstowood_tpu.train.loss import poly1_focal_loss

    cfg = TrainConfig()
    net = Net(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    refl = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    sf = jnp.asarray(
        np.linalg.norm(np.asarray(pos), axis=2).max(axis=1).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, (B, N)).astype(np.float32))
    key = jax.random.key(1)

    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, pos, refl, mask, sf
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    def fwd_train(params, batch_stats, pos, refl, mask, sf, labels, key):
        logits, _ = net.apply(
            {"params": params, "batch_stats": batch_stats},
            pos, refl, mask, sf, training=True,
            rngs={"sample": key}, mutable=["batch_stats"],
        )
        loss, _ = poly1_focal_loss(
            logits, labels, epsilon=cfg.poly_epsilon, gamma=cfg.focal_gamma,
            alpha=None, label_smoothing=cfg.label_smoothing, mask=mask,
            reduction="mean",
        )
        return loss

    grad_fn = jax.jit(jax.grad(fwd_train))
    args = (params, batch_stats, pos, refl, mask, sf, labels, key)
    out = grad_fn(*args)  # compile + warm
    np.asarray(read(jax.tree_util.tree_leaves(out)[0]))

    tmpdir = os.environ.get("TST_TRACE_DIR") or tempfile.mkdtemp(
        prefix="tst_trace_")
    with jax.profiler.trace(tmpdir):
        for _ in range(ITERS):
            out = grad_fn(*args)
        np.asarray(read(jax.tree_util.tree_leaves(out)[0]))

    files = glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace file found under", tmpdir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # find the XLA Ops lane: thread whose name metadata says "XLA Ops"
    op_tids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            if "XLA Ops" in ev.get("args", {}).get("name", ""):
                op_tids.add((ev.get("pid"), ev.get("tid")))
    per_op = collections.Counter()
    per_cat = collections.Counter()
    examples = {}
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        dur = ev.get("dur", 0) / 1000.0 / ITERS  # us -> ms, per-iter
        name = ev.get("name", "?")
        per_op[name] += dur
        cat = categorize(name)
        per_cat[cat] += dur
        total += dur
        args_ = ev.get("args", {})
        src = args_.get("tf_op") or args_.get("long_name") or ""
        if name not in examples and src:
            examples[name] = src[:100]
    # module/phase rollup from source attribution
    import re

    per_mod = collections.Counter()
    per_layer = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        dur = ev.get("dur", 0) / 1000.0 / ITERS
        src = (ev.get("args", {}).get("tf_op")
               or ev.get("args", {}).get("long_name") or "")
        phase = "bwd" if "transpose(jvp" in src else "fwd"
        m = re.search(r"(sa\d_module|fp\d_module|knn_interpolate|stem_mlp|"
                      r"conv1|conv2|norm|poly1|adamw|reflectanceyesno)", src)
        mod = m.group(1) if m else ("?" if src else "(no-src)")
        per_mod[(phase, mod)] += dur
        lay = re.search(r"(local_nn|residual_block|knn_masked|approx_min_k|"
                        r"group_min|top2|gather|scatter|add_any|lin\d|bn\d|"
                        r"dw_bn|pw_bn|expand_bn|mid_bn|out_bn|project_bn)", src)
        per_layer[(phase, mod, lay.group(1) if lay else "-")] += dur

    print(f"trace: {path}")
    print(f"device busy per step: {total:.1f} ms  ({len(per_op)} distinct ops)")
    print("\n== category rollup ==")
    for cat, ms in per_cat.most_common():
        print(f"{cat:14s} {ms:8.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%")
    print("\n== module rollup ==")
    for (phase, mod), ms in per_mod.most_common(40):
        if ms < 0.3:
            continue
        print(f"{phase} {mod:22s} {ms:8.2f} ms")
    print("\n== layer rollup (>= 0.5 ms) ==")
    for (phase, mod, lay), ms in per_layer.most_common(60):
        if ms < 0.5:
            continue
        print(f"{phase} {mod:18s} {lay:14s} {ms:8.2f} ms")
    print("\n== top 30 ops ==")
    for name, ms in per_op.most_common(30):
        print(f"{ms:8.2f} ms  {name[:70]:70s}  {examples.get(name, '')[:60]}")


if __name__ == "__main__":
    main()
