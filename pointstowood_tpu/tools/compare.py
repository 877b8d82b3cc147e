"""Evaluation vs FSCT outputs on labeled plots.

Reimplements the reference comparetofsct.py
(reference: pointstowood/comparetofsct.py:26-168): pair ``*_fsct.ply`` with
``*_ours.ply`` files in a directory, filter FSCT's label==2 class handling,
binarize labels, compute precision / recall / balanced accuracy / F1 (and
path-length-weighted balanced accuracy when a ``pathlength`` column is
present) against the ``truth`` column, group by country code in the file
name (pol/spa/fin -> Poland/Spain/Finland), and write results.csv
(+results.png when matplotlib is available).

Run: python -m pointstowood_tpu.tools.compare <directory>
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
import pandas as pd

from sklearn.metrics import (
    balanced_accuracy_score,
    f1_score,
    precision_score,
    recall_score,
)

_COUNTRIES = {"pol": "Poland", "spa": "Spain", "fin": "Finland"}


def _evaluate(pc: pd.DataFrame) -> dict:
    truth = (pc["truth"].to_numpy() > 0).astype(int)
    pred = (pc["label"].to_numpy() > 0).astype(int)
    row = {
        "precision": precision_score(truth, pred, zero_division=0),
        "recall": recall_score(truth, pred, zero_division=0),
        "balanced_accuracy": balanced_accuracy_score(truth, pred),
        "f1": f1_score(truth, pred, zero_division=0),
    }
    if "pathlength" in pc.columns:
        w = pc["pathlength"].to_numpy()
        w = w / max(w.max(), 1e-12)
        row["weighted_balanced_accuracy"] = balanced_accuracy_score(
            truth, pred, sample_weight=w
        )
    return row


def country_of(path: str) -> str:
    name = os.path.basename(path).lower()
    for code, country in _COUNTRIES.items():
        if code in name:
            return country
    return "Other"


def compare_directory(directory: str, ours_suffix: str = "_ours.ply",
                      rival_suffix: str = "_fsct.ply") -> pd.DataFrame:
    from pointstowood_tpu.io import load_file

    rows = []
    for rival_path in sorted(glob.glob(os.path.join(directory, f"*{rival_suffix}"))):
        ours_path = rival_path.replace(rival_suffix, ours_suffix)
        if not os.path.exists(ours_path):
            continue
        rival = load_file(rival_path)
        ours = load_file(ours_path)
        # FSCT convention: its label column uses 2 for wood; binarize
        if "label" in rival.columns:
            rival = rival.copy()
            rival["label"] = (rival["label"].to_numpy() == 2).astype(float)
        for model, pc in (("fsct", rival), ("ours", ours)):
            if "truth" not in pc.columns or "label" not in pc.columns:
                continue
            row = _evaluate(pc)
            row.update(
                {"plot": os.path.basename(rival_path).replace(rival_suffix, ""),
                 "model": model, "country": country_of(rival_path)}
            )
            rows.append(row)
    return pd.DataFrame(rows)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("directory")
    p.add_argument("--ours-suffix", default="_ours.ply")
    p.add_argument("--rival-suffix", default="_fsct.ply")
    args = p.parse_args(argv)

    df = compare_directory(args.directory, args.ours_suffix, args.rival_suffix)
    if df.empty:
        print("no paired files found")
        return
    summary = df.groupby(["country", "model"]).mean(numeric_only=True).round(3)
    print(summary)
    out_csv = os.path.join(args.directory, "results.csv")
    summary.to_csv(out_csv)
    print(f"Saved {out_csv}")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        summary["balanced_accuracy"].unstack("model").plot.bar(ax=ax)
        ax.set_ylabel("balanced accuracy")
        fig.tight_layout()
        fig.savefig(os.path.join(args.directory, "results.png"), dpi=150)
        print(f"Saved {os.path.join(args.directory, 'results.png')}")
    except Exception:
        pass


if __name__ == "__main__":
    main()
