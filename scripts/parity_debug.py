"""Stage-by-stage divergence probe for the full-net parity harness."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import functools

import numpy as np
import torch
import jax.numpy as jnp

from reference_oracle import (
    OracleNet,
    consecutive_cluster_perm,
    voxel_grid_ids,
)
from test_full_net_parity import C, K, N, _cloud, _flax_net, _randomized_oracle
from pointstowood_tpu.utils.checkpoint_convert import (
    convert_torch_state_dict,
    merge_into_variables,
)

seed = 3
xyz, refl, sf = _cloud(seed)
om = _randomized_oracle(seed)

# ---- oracle stagewise
with torch.no_grad():
    tp = torch.tensor(xyz)
    tr = torch.tensor(refl)
    ts = torch.tensor(sf)
    x0 = om.stem_mlp(tp)
    x1, p1, r1 = om.sa1_module(x0, tp, tr, ts)
    x2, p2, r2 = om.sa2_module(x1, p1, r1, ts)
    x3, p3, r3 = om.sa3_module(x2, p2, r2, ts)

# ---- flax stagewise via capture
net = _flax_net()
pos_j = jnp.asarray(xyz[None])
refl_j = jnp.asarray(refl[None])
mask_j = jnp.ones((1, N), bool)
sf_j = jnp.asarray([sf], dtype=jnp.float32)
variables = jax.jit(functools.partial(net.init, training=False))(
    {"params": jax.random.key(0)}, pos_j, refl_j, mask_j, sf_j
)
merged = merge_into_variables(variables, convert_torch_state_dict(om.state_dict()))

_, inter = net.apply(
    merged, pos_j, refl_j, mask_j, sf_j, training=False,
    capture_intermediates=True, mutable=["intermediates"],
)


def get(path):
    node = inter["intermediates"]
    for p in path.split("/"):
        node = node[p]
    return np.asarray(node["__call__"][0])


def compare_stage(name, tx, tpos, jx_path):
    """Match flax centers to oracle centers by position, compare features."""
    out = get(jx_path)
    print(name, "flax shape", out.shape if not isinstance(out, tuple) else [o.shape for o in out])


# SAStage returns tuples; capture gives the tuple
for mod in ["stem_mlp", "sa1_module", "sa2_module", "sa3_module"]:
    node = inter["intermediates"][mod]["__call__"][0]
    if isinstance(node, tuple):
        shapes = [np.asarray(v).shape for v in node]
        print(mod, shapes)
    else:
        print(mod, np.asarray(node).shape)

# stem parity
stem = np.asarray(inter["intermediates"]["stem_mlp"]["__call__"][0])[0]
print("stem max|d|:", np.abs(stem - x0.numpy()).max())

# sa1: match by center positions
sx, sp, sr, sm = inter["intermediates"]["sa1_module"]["__call__"][0]
sx, sp, sm = np.asarray(sx)[0], np.asarray(sp)[0], np.asarray(sm)[0]
valid = sm
print("sa1 centers flax:", valid.sum(), "oracle:", p1.shape[0])
fp_ = sp[valid]
op_ = p1.numpy()
# match rows
from scipy.spatial import cKDTree

d, idx = cKDTree(op_).query(fp_)
print("sa1 center pos match: max d =", d.max())
fx = np.asarray(sx)[valid] if sx.ndim == 2 else np.asarray(sx)[0][valid]
ox = x1.numpy()[idx]
print("sa1 feat max|d|:", np.abs(fx - ox).max(),
      "rel:", (np.abs(fx - ox) / (np.abs(ox) + 1e-6)).max())

sx2, sp2, sr2, sm2 = inter["intermediates"]["sa2_module"]["__call__"][0]
sx2, sp2, sm2 = np.asarray(sx2)[0], np.asarray(sp2)[0], np.asarray(sm2)[0]
print("sa2 centers flax:", sm2.sum(), "oracle:", p2.shape[0])
d2, idx2 = cKDTree(p2.numpy()).query(sp2[sm2])
print("sa2 center pos match: max d =", d2.max())
fx2 = sx2[sm2]
ox2 = x2.numpy()[idx2]
print("sa2 feat max|d|:", np.abs(fx2 - ox2).max())

sx3, sp3, sr3, sm3 = inter["intermediates"]["sa3_module"]["__call__"][0]
sx3, sp3, sm3 = np.asarray(sx3)[0], np.asarray(sp3)[0], np.asarray(sm3)[0]
print("sa3 centers flax:", sm3.sum(), "oracle:", p3.shape[0])
d3, idx3 = cKDTree(p3.numpy()).query(sp3[sm3])
print("sa3 center pos match: max d =", d3.max())
fx3 = sx3[sm3]
ox3 = x3.numpy()[idx3]
print("sa3 feat max|d|:", np.abs(fx3 - ox3).max())
