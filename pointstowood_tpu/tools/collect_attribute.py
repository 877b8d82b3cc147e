"""1-NN attribute transfer between clouds with a distance cutoff.

Reimplements the reference utility
(reference: pointstowood/utils/collect_attribute.py:23-34): for every point
of the target cloud, copy the requested attribute columns from its nearest
source-cloud point, blanking transfers farther than ``--distance``.
Uses the native grid kNN (scipy fallback inside).

Run: python -m pointstowood_tpu.tools.collect_attribute target.ply
     source.ply --attributes label pwood --distance 0.1
"""

from __future__ import annotations

import argparse

import numpy as np


def collect_attributes(target, source, attributes, max_distance=None):
    from pointstowood_tpu.predict.fusion import knn_indices

    idx = knn_indices(
        source[["x", "y", "z"]].to_numpy(), target[["x", "y", "z"]].to_numpy(), 1
    )[:, 0]
    d = np.linalg.norm(
        target[["x", "y", "z"]].to_numpy() - source[["x", "y", "z"]].to_numpy()[idx],
        axis=1,
    )
    for attr in attributes:
        vals = source[attr].to_numpy()[idx].astype(float)
        if max_distance is not None:
            vals = np.where(d <= max_distance, vals, 0.0)
        target[attr] = vals
    return target


def main(argv=None):
    from pointstowood_tpu.io import load_file, save_file

    p = argparse.ArgumentParser()
    p.add_argument("target", help="cloud receiving the attributes")
    p.add_argument("source", help="cloud providing the attributes")
    p.add_argument("--attributes", nargs="+", required=True)
    p.add_argument("--distance", type=float, default=None,
                   help="max transfer distance; farther points get 0")
    p.add_argument("--odir", type=str, default=None)
    args = p.parse_args(argv)

    target = load_file(args.target)
    source = load_file(args.source)
    target = collect_attributes(target, source, args.attributes, args.distance)
    out = args.odir or args.target.replace(".ply", "_attr.ply")
    save_file(out, target,
              additional_fields=[c for c in target.columns if c not in ("x", "y", "z")])
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
