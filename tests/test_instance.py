"""Instance segmentation tests on synthetic two-tree scenes."""

import numpy as np
import pandas as pd

from pointstowood_tpu.tools.instance import instance_segment


def _two_trees(rng, sep=8.0):
    frames = []
    for cx in (0.0, sep):
        n_wood, n_leaf = 1200, 800
        theta = rng.uniform(0, 2 * np.pi, n_wood)
        r = rng.uniform(0, 0.15, n_wood)
        trunk = np.stack(
            [cx + r * np.cos(theta), r * np.sin(theta),
             rng.uniform(0, 8, n_wood)], 1,
        )
        crown = np.stack(
            [cx + rng.normal(0, 1.0, n_leaf), rng.normal(0, 1.0, n_leaf),
             6 + rng.normal(0, 0.8, n_leaf)], 1,
        )
        xyz = np.concatenate([trunk, crown])
        label = np.concatenate([np.ones(n_wood), np.zeros(n_leaf)])
        frames.append(pd.DataFrame(
            {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2], "label": label,
             "n_z": xyz[:, 2]}))
    return pd.concat(frames, ignore_index=True)


def test_two_trees_separate_instances(rng):
    pc = _two_trees(rng)
    inst = instance_segment(pc)
    per_tree = len(pc) // 2
    t0 = inst[:per_tree]
    t1 = inst[per_tree:]
    # wood points of each tree dominantly in one instance, different ones
    w0 = t0[pc["label"].to_numpy()[:per_tree] > 0]
    w1 = t1[pc["label"].to_numpy()[per_tree:] > 0]
    m0 = np.bincount(w0[w0 >= 0]).argmax()
    m1 = np.bincount(w1[w1 >= 0]).argmax()
    assert m0 != m1
    assert (w0 == m0).mean() > 0.9
    assert (w1 == m1).mean() > 0.9
    # leaves attach to their own tree
    l0 = t0[pc["label"].to_numpy()[:per_tree] == 0]
    assert (l0[l0 >= 0] == m0).mean() > 0.9


def test_nine_tree_plot_counts_and_assignment(rng):
    """Plot-scale sanity (VERDICT r2 item 10): a 3x3 grid of 9 trees must
    yield exactly 9 instances with high per-tree wood assignment purity —
    the tree-count evidence for the hull-skeleton + voxel-face pipeline."""
    frames, truth = [], []
    sep = 6.0
    for ti in range(9):
        cx, cy = (ti % 3) * sep, (ti // 3) * sep
        n_wood, n_leaf = 700, 500
        theta = rng.uniform(0, 2 * np.pi, n_wood)
        r = rng.uniform(0, 0.15, n_wood)
        trunk = np.stack(
            [cx + r * np.cos(theta), cy + r * np.sin(theta),
             rng.uniform(0, 7, n_wood)], 1,
        )
        crown = np.stack(
            [cx + rng.normal(0, 0.9, n_leaf), cy + rng.normal(0, 0.9, n_leaf),
             5.5 + rng.normal(0, 0.7, n_leaf)], 1,
        )
        xyz = np.concatenate([trunk, crown])
        label = np.concatenate([np.ones(n_wood), np.zeros(n_leaf)])
        frames.append(pd.DataFrame(
            {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
             "label": label, "n_z": xyz[:, 2]}))
        truth.append(np.full(len(xyz), ti))
    pc = pd.concat(frames, ignore_index=True)
    truth = np.concatenate(truth)
    inst = instance_segment(pc)
    wood = pc["label"].to_numpy() > 0
    assigned = inst >= 0
    assert len(np.unique(inst[assigned])) == 9
    # every true tree's wood maps dominantly to one distinct instance
    seen = set()
    for ti in range(9):
        w = inst[wood & (truth == ti) & assigned]
        vals, cnts = np.unique(w, return_counts=True)
        top = vals[cnts.argmax()]
        assert cnts.max() / cnts.sum() > 0.95
        assert top not in seen
        seen.add(top)


def test_instance_no_wood(rng):
    pc = pd.DataFrame(
        {"x": rng.uniform(0, 5, 100), "y": rng.uniform(0, 5, 100),
         "z": rng.uniform(0, 5, 100), "label": np.zeros(100),
         "n_z": rng.uniform(0, 5, 100)}
    )
    inst = instance_segment(pc)
    assert (inst == -1).all()
