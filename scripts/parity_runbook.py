#!/usr/bin/env python3
"""Weights-in-hand accuracy-parity runbook (VERDICT r4 item 6).

The north-star parity check — per-point probabilities / labels matching
the reference on its own pretrained weights and plots — is blocked here
only by missing artifacts (the model zoo is stripped from the mirror,
reference README.md:78-80, and the public datasets need egress). This
script makes parity A RUN, NOT A PROJECT the moment those artifacts
appear:

    python scripts/parity_runbook.py \
        --weights global.pth --ply wang_plot.ply \
        --reference-output wang_plot_reference_out.ply

does: convert (torch .pth -> flax, key-complete converter) -> dual-grid
predict at the exact-parity flags (--dtype float32 --exact_knn
--fusion host, reference invocation predict.py:61-74 semantics) ->
per-point probability diff + label agreement vs the reference-run output
(src/predicter.py:211-217 writes label/pwood back onto the input rows),
plus balanced accuracy vs a truth column when the input carries one.
Output: one JSON line per comparison — the BASELINE.md config-1/4 rows.

No reference output yet? Omit --reference-output: the run still emits
the BA-vs-truth row for the weights you have.

Dry run (no real artifacts needed; exercised in CI):

    python scripts/parity_runbook.py --dry-run

synthesizes a labeled plot, builds a TRAINED-format torch checkpoint
from the plain-torch oracle net (tests/reference_oracle.py — identical
state_dict layout to the reference), converts it, runs the exact-parity
path as the stand-in "reference output", then compares the default fast
path against it end-to-end through the same machinery.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_predict(ply: str, weights: str, channels: int, max_pts: int,
                parity: bool, batch_size: int = 8) -> str:
    """Run the product predict CLI in-process; returns the output path."""
    from pointstowood_tpu.cli.predict import main as predict_main

    argv = [
        "--point-cloud", ply,
        "--model", weights,
        "--channels", str(channels),
        "--batch_size", str(batch_size),
        "--grid_size", "2.0", "4.0",
        "--min_pts", "128",
        "--max_pts", str(max_pts),
        "--is-wood", "0.5",
    ]
    if parity:
        argv += ["--dtype", "float32", "--exact_knn", "--fusion", "host"]
    predict_main(argv)
    return os.path.splitext(ply)[0] + "_ours.ply"


def aligned(a, b):
    """Row-align two outputs of the same plot. Both the reference and this
    framework write label/pwood onto the input rows in order; if row
    orders differ (e.g. a reference run that re-sorted), fall back to an
    exact xyz lexsort join."""
    ax = a[["x", "y", "z"]].to_numpy()
    bx = b[["x", "y", "z"]].to_numpy()
    if len(a) == len(b) and np.allclose(ax, bx, atol=1e-4):
        return a, b
    oa = np.lexsort(ax.T)
    ob = np.lexsort(bx.T)
    a, b = a.iloc[oa].reset_index(drop=True), b.iloc[ob].reset_index(drop=True)
    assert np.allclose(a[["x", "y", "z"]].to_numpy(),
                       b[["x", "y", "z"]].to_numpy(), atol=1e-4), (
        "point sets differ between the two outputs; not the same plot?")
    return a, b


def compare_outputs(ours_path: str, ref_path: str) -> dict:
    from pointstowood_tpu.io import load_file

    ours, _ = load_file(ours_path, additional_headers=True)
    ref, _ = load_file(ref_path, additional_headers=True)
    ours, ref = aligned(ours, ref)
    dp = np.abs(ours["pwood"].to_numpy() - ref["pwood"].to_numpy())
    lo = ours["label"].to_numpy()
    lr = ref["label"].to_numpy()
    return {
        "n_points": int(len(ours)),
        "label_agreement": round(float((lo == lr).mean()), 5),
        "pwood_absdiff_mean": round(float(dp.mean()), 5),
        "pwood_absdiff_p95": round(float(np.quantile(dp, 0.95)), 5),
        "pwood_absdiff_max": round(float(dp.max()), 5),
    }


def truth_metrics(out_path: str, truth: np.ndarray) -> dict:
    from pointstowood_tpu.io import load_file

    ours, _ = load_file(out_path, additional_headers=True)
    pred = ours["label"].to_numpy().astype(int)
    t = truth.astype(int)
    tp = int(((pred == 1) & (t == 1)).sum())
    tn = int(((pred == 0) & (t == 0)).sum())
    fp = int(((pred == 1) & (t == 0)).sum())
    fn = int(((pred == 0) & (t == 1)).sum())
    rec1 = tp / max(tp + fn, 1)
    rec0 = tn / max(tn + fp, 1)
    return {
        "balanced_accuracy": round((rec1 + rec0) / 2, 4),
        "recall_wood": round(rec1, 4),
        "recall_leaf": round(rec0, 4),
    }


def make_oracle_checkpoint(path: str, channels: int, seed: int = 0) -> None:
    """A TRAINED-format reference checkpoint from the plain-torch oracle
    (state_dict layout identical to the reference's Net)."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from reference_oracle import OracleNet

    torch.manual_seed(seed)
    net = OracleNet(C=channels)
    # the reference saves {'model_state_dict': ...} (src/trainer.py:306)
    torch.save({"model_state_dict": net.state_dict()}, path)


def synth_plot(path: str, n_trees: int = 5, pts_per_tree: int = 12_000,
               seed: int = 7) -> np.ndarray:
    """Labeled synthetic forest plot; returns the truth labels (row order
    preserved by both predict paths)."""
    import pandas as pd

    from pointstowood_tpu.io import save_file

    rng = np.random.default_rng(seed)
    xs, rs, ls = [], [], []
    for t in range(n_trees):
        n_wood = pts_per_tree // 4
        n_leaf = pts_per_tree - n_wood
        theta = rng.uniform(0, 2 * np.pi, n_wood)
        r = rng.uniform(0, 0.15, n_wood)
        trunk = np.stack([r * np.cos(theta), r * np.sin(theta),
                          rng.uniform(0, 8.0, n_wood)], 1)
        crown = rng.normal(0, 0.8, size=(n_leaf, 3)) + [0, 0, 6.0]
        xyz = np.concatenate([trunk, crown]).astype(np.float32)
        xyz[:, :2] += rng.uniform(0, 12.0, 2).astype(np.float32)
        xs.append(xyz)
        rs.append(np.concatenate([rng.normal(2.0, 0.3, n_wood),
                                  rng.normal(-1.0, 0.5, n_leaf)]))
        ls.append(np.concatenate([np.ones(n_wood), np.zeros(n_leaf)]))
    xyz = np.concatenate(xs)
    refl = np.concatenate(rs).astype(np.float32)
    truth = np.concatenate(ls).astype(np.float32)
    df = pd.DataFrame({"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
                       "scalar_Refl": refl})
    save_file(path, df, additional_fields=["scalar_Refl"])
    return truth


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--weights", help="reference .pth checkpoint "
                    "(e.g. the zoo's global.pth) or a native .ckpt")
    ap.add_argument("--ply", help="input plot (PLY/PCD/LAS)")
    ap.add_argument("--reference-output",
                    help="the reference run's output PLY for the same plot "
                         "(predict.py writes <input>_out.ply)")
    ap.add_argument("--truth-column", default=None,
                    help="column in the INPUT file holding 0/1 wood truth "
                         "(reference convention: label at column 4)")
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--max_pts", type=int, default=16384)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--fast", action="store_true",
                    help="ALSO run the default fast path and report its "
                         "deviation from the parity run")
    ap.add_argument("--dry-run", action="store_true",
                    help="no artifacts needed: oracle checkpoint + "
                         "synthetic plot, fast-vs-exact comparison")
    args = ap.parse_args(argv)

    if args.dry_run:
        with tempfile.TemporaryDirectory() as td:
            ply = os.path.join(td, "plot.ply")
            weights = os.path.join(td, "global.pth")
            channels = 16  # CPU-feasible dry-run width
            truth = synth_plot(ply)
            make_oracle_checkpoint(weights, channels)
            print("[runbook] dry run: oracle checkpoint + "
                  f"{len(truth):,}-pt synthetic plot", file=sys.stderr)
            out_parity = run_predict(ply, weights, channels,
                                     max_pts=4096, parity=True,
                                     batch_size=args.batch_size)
            os.rename(out_parity, os.path.join(td, "reference_out.ply"))
            ref_out = os.path.join(td, "reference_out.ply")
            out_fast = run_predict(ply, weights, channels,
                                   max_pts=4096, parity=False,
                                   batch_size=args.batch_size)
            row = {"config": "dry-run (oracle ckpt, synthetic plot, "
                             "fast vs exact-parity)"}
            row.update(compare_outputs(out_fast, ref_out))
            print(json.dumps(row))
        return

    if not (args.weights and args.ply):
        ap.error("--weights and --ply are required (or use --dry-run)")

    out_parity = run_predict(args.ply, args.weights, args.channels,
                             args.max_pts, parity=True,
                             batch_size=args.batch_size)
    rows = []
    if args.reference_output:
        row = {"config": "exact-parity vs reference output"}
        row.update(compare_outputs(out_parity, args.reference_output))
        rows.append(row)
    if args.truth_column:
        from pointstowood_tpu.io import load_file

        pc, _ = load_file(args.ply, additional_headers=True)
        truth = pc[args.truth_column].to_numpy()
        row = {"config": "exact-parity vs truth"}
        row.update(truth_metrics(out_parity, truth))
        rows.append(row)
    if args.fast:
        parity_kept = out_parity + ".parity"
        os.replace(out_parity, parity_kept)
        out_fast = run_predict(args.ply, args.weights, args.channels,
                               args.max_pts, parity=False,
                               batch_size=args.batch_size)
        row = {"config": "fast default vs exact-parity"}
        row.update(compare_outputs(out_fast, parity_kept))
        rows.append(row)
    if not rows:
        rows.append({"config": "exact-parity run only (no reference "
                               "output / truth column given)",
                     "output": out_parity})
    for row in rows:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
