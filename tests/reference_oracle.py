"""Plain-torch behavioral replica of the reference network forward.

This is the full-network parity oracle: it reproduces the reference
``Net.forward`` (reference: pointstowood/src/model.py:204-245) and its
custom ``PointNetConv`` message passing (src/pointnet.py:86-132) using only
torch CPU ops — PyG/torch-cluster are replaced by their documented exact
semantics:

  * ``voxel_grid`` + ``consecutive_cluster`` (model.py:103-106): grid hash
    with per-dimension min origin (torch_cluster grid_cluster default),
    representative = LAST occurrence per cell in array order (the CPU
    serial-scatter semantics of torch_geometric consecutive_cluster).
  * ``radius`` (model.py:118): neighbors within r, capped at k. The real
    torch-cluster kernel returns an *arbitrary* k-subset when a ball holds
    more than k points; this oracle takes the k nearest and asserts the cap
    is never hit so the choice is immaterial.
  * ``knn`` (model.py:120): exact k nearest by L2.
  * ``knn_interpolate`` (model.py:149): k nearest + 1/clamp(d^2, 1e-16)
    inverse-square-distance weights (torch_geometric knn_interpolate).

All learnable modules reuse the structural replicas from the converter
tests (identical state_dict layout to the reference), so a single
state_dict drives both this oracle and the converted flax model.

Single-sample (batch = one tile) eval-mode only: the parity target is the
inference path (BASELINE north star: per-point probabilities within
tolerance).
"""

import torch
import torch.nn as tnn

from test_checkpoint_convert import _TorchIRB, _torch_mlp


def voxel_grid_ids(pos: torch.Tensor, size: float) -> torch.Tensor:
    """torch_cluster grid_cluster semantics: per-dim min origin, floor,
    ids packed x-fastest (c0 + c1*s0 + c2*s0*s1) — the packing order
    matters because consecutive_cluster emits centers sorted by id, and
    the NEXT stage's last-occurrence representative depends on it."""
    start = pos.min(dim=0).values
    cell = torch.floor((pos - start) / size).long()
    extent = cell.max(dim=0).values + 1
    return cell[:, 0] + cell[:, 1] * extent[0] + cell[:, 2] * extent[0] * extent[1]


def consecutive_cluster_perm(src: torch.Tensor) -> torch.Tensor:
    """Exact torch_geometric consecutive_cluster representative choice
    (torch_geometric/nn/pool/consecutive.py): scatter_ of arange over the
    inverse mapping — on CPU the serial last write wins, so the
    representative is the last member of each cluster in array order."""
    unique, inv = torch.unique(src, sorted=True, return_inverse=True)
    perm = torch.arange(inv.size(0), device=inv.device)
    out = inv.new_empty(unique.size(0)).scatter_(0, inv, perm)
    return out


def knn_exact(sources: torch.Tensor, queries: torch.Tensor, k: int):
    """(row, col): for each query, indices of the k nearest sources."""
    k = min(k, sources.shape[0])
    d = torch.cdist(queries, sources)
    _, col = torch.topk(d, k, dim=1, largest=False)
    row = torch.arange(queries.shape[0]).unsqueeze(1).expand_as(col)
    return row.reshape(-1), col.reshape(-1)


def radius_capped(sources: torch.Tensor, queries: torch.Tensor, r: float,
                  k: int):
    """Neighbors within r, capped at k (nearest-first). Asserts the cap
    never truncates, so the oracle is independent of torch-cluster's
    arbitrary over-cap subset choice."""
    d = torch.cdist(queries, sources)
    within = d <= r
    counts = within.sum(dim=1)
    assert int(counts.max()) <= k, (
        f"radius cap hit ({int(counts.max())} > {k}); sparsify the fixture"
    )
    rows, cols = [], []
    for i in range(queries.shape[0]):
        c = torch.nonzero(within[i], as_tuple=False).reshape(-1)
        rows.append(torch.full((c.numel(),), i, dtype=torch.long))
        cols.append(c)
    return torch.cat(rows), torch.cat(cols)


def scatter_amax(values: torch.Tensor, index: torch.Tensor, n: int,
                 fill: float = 0.0) -> torch.Tensor:
    """Segment max with empty segments -> fill (torch_scatter scatter_max
    leaves untouched rows at their init value, which PyG fills with 0)."""
    out = torch.full((n,) + values.shape[1:], -torch.inf, dtype=values.dtype)
    out.index_reduce_(0, index, values, "amax", include_self=False)
    return torch.where(torch.isinf(out), torch.tensor(fill), out)


def pointnetconv(x, pos4, idx, row, col, local_nn):
    """Reference PointNetConv.message + max aggregation
    (src/pointnet.py:108-132): msg = [x_j, (pos_j - pos_i)/(maxdist_i +
    1e-8), reflectance_j] -> local_nn -> scatter max per center."""
    pos_t = pos4[idx]
    rel = pos4[col, :3] - pos_t[row, :3]
    dist = torch.norm(rel, dim=1, keepdim=True)
    maxd = scatter_amax(dist, row, idx.shape[0])
    msg = torch.zeros((col.shape[0], 4))
    msg[:, :3] = rel / (maxd[row] + 1e-8)
    msg[:, 3] = pos4[col, 3]
    msg = torch.cat([x[col], msg], dim=1)
    msg = local_nn(msg)
    return scatter_amax(msg, row, idx.shape[0])


def knn_interpolate(x, pos_src, pos_tgt, k=2):
    """torch_geometric knn_interpolate semantics."""
    row, col = knn_exact(pos_src, pos_tgt, k)
    diff = pos_src[col] - pos_tgt[row]
    sqd = (diff * diff).sum(dim=-1, keepdim=True)
    w = 1.0 / torch.clamp(sqd, min=1e-16)
    num = torch.zeros((pos_tgt.shape[0], x.shape[1]))
    num.index_add_(0, row, x[col] * w)
    den = torch.zeros((pos_tgt.shape[0], 1))
    den.index_add_(0, row, w)
    return num / den


class OracleSAModule(tnn.Module):
    """Reference SAModule (model.py:87-127), eval path only."""

    def __init__(self, resolution, k, nn_widths, rnn):
        super().__init__()
        self.resolution = resolution
        self.k = k
        conv = tnn.Module()
        conv.local_nn = _torch_mlp(nn_widths)
        self.conv = conv
        self.residual_block = _TorchIRB(rnn)
        gate = tnn.Module()
        gate.fc1 = tnn.Linear(1, 32)
        gate.fc2 = tnn.Linear(32, 32)
        gate.fc3 = tnn.Linear(32, 1)
        self.reflectanceyesno = gate

    def forward(self, x, pos, reflectance, sf):
        # model.py:109 — pos becomes [xyz, reflectance]. The gate multiply
        # (model.py:110-112) is omitted because gumbel_softmax over a
        # 1-element dim is identically 1.0 (its parameters still exist for
        # state_dict parity).
        pos = torch.cat([pos[:, :3], reflectance.unsqueeze(-1)], dim=-1)
        idx = consecutive_cluster_perm(
            voxel_grid_ids(pos[:, :3], self.resolution)
        )  # model.py:103-106,116
        if self.resolution == 0.04:
            row, col = radius_capped(pos[:, :3], pos[idx, :3],
                                     self.resolution * 2, self.k)
        else:
            row, col = knn_exact(pos[:, :3], pos[idx, :3], self.k)
        pos = pos.clone()
        pos[:, :3] = pos[:, :3] / sf  # model.py:122 (B=1: sf scalar)
        x = pointnetconv(x, pos, idx, row, col, self.conv.local_nn)
        pos[:, :3] = pos[:, :3] * sf
        x = self.residual_block(x)
        return x, pos[idx, :3], reflectance[idx]


class OracleNet(tnn.Module):
    """Reference Net (model.py:204-245) with a working plain-torch forward.
    state_dict layout is identical to the reference's (the converter's key
    map covers every entry)."""

    def __init__(self, C=32, num_classes=1, k=32):
        super().__init__()
        C4, C8, C16 = C * 4, C * 8, C * 16
        self.stem_mlp = _torch_mlp([3, C])
        self.sa1_module = OracleSAModule(0.04, k, [C + 4, C * 2, C4], C4)
        self.sa2_module = OracleSAModule(0.08, k, [C4 + 4, C * 6, C8], C8)
        self.sa3_module = OracleSAModule(0.16, k, [C8 + 4, C * 12, C16], C16)
        sa4 = tnn.Module()
        sa4.NN = _torch_mlp([C16 + 3, C16, C16])
        self.sa4_module = sa4

        def fp(widths):
            m = tnn.Module()
            m.NN = _torch_mlp(widths)
            return m

        self.fp4_module = fp([C * 32, C * 24, C16])
        self.fp3_module = fp([C * 24, C * 20, C16])
        self.fp2_module = fp([C * 20, C16, C16])
        self.fp1_module = fp([C * 17, C16, C16])
        self.conv1 = tnn.Conv1d(C16, C16, 1)
        self.conv2 = tnn.Conv1d(C16, num_classes, 1)
        self.norm = tnn.BatchNorm1d(C16)

    def forward(self, pos, reflectance, sf):
        x0 = self.stem_mlp(pos[:, :3])  # model.py:228
        x1, p1, r1 = self.sa1_module(x0, pos, reflectance, sf)
        x2, p2, r2 = self.sa2_module(x1, p1, r1, sf)
        x3, p3, r3 = self.sa3_module(x2, p2, r2, sf)
        # GlobalSAModule (model.py:129-140), B=1: max over all points
        g = self.sa4_module.NN(torch.cat([x3, p3], dim=1))
        g = g.max(dim=0, keepdim=True).values
        gp = torch.zeros((1, 3))
        # FP stack (model.py:142-153,236-239)
        y = knn_interpolate(g, gp, p3, k=2)
        y = self.fp4_module.NN(torch.cat([y, x3], dim=1))
        y = knn_interpolate(y, p3, p2, k=2)
        y = self.fp3_module.NN(torch.cat([y, x2], dim=1))
        y = knn_interpolate(y, p2, p1, k=2)
        y = self.fp2_module.NN(torch.cat([y, x1], dim=1))
        y = knn_interpolate(y, p1, pos[:, :3], k=2)
        y = self.fp1_module.NN(torch.cat([y, x0], dim=1))
        # head (model.py:241-243)
        y = self.conv1(y.t().unsqueeze(0))
        y = torch.relu(self.norm(y))
        y = self.conv2(y).squeeze()
        return y.float()
