"""Torch -> flax checkpoint conversion tests.

A pure-torch replica of the reference's parameter structure (plain
Linear/Conv1d/BatchNorm1d Sequentials — torch_geometric is not needed
because all learnable state lives in those) provides both the state_dict
fixture and a numerical forward oracle for the converted layers.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from pointstowood_tpu.model.layers import InvertedResidualBlock, RefMLP
from pointstowood_tpu.utils.checkpoint_convert import (
    build_key_map,
    convert_torch_state_dict,
    merge_into_variables,
)


def _torch_mlp(channels):
    """Reference MLP factory structure (model.py:198-202)."""
    blocks = []
    for i in range(1, len(channels)):
        layers = [tnn.Linear(channels[i - 1], channels[i]), tnn.ReLU()]
        if i != 1:
            layers.append(tnn.BatchNorm1d(channels[i]))
        blocks.append(tnn.Sequential(*layers))
    return tnn.Sequential(*blocks)


class _TorchDSConv(tnn.Module):
    """DepthwiseSeparableConv1d structure (model.py:18-44)."""

    def __init__(self, c):
        super().__init__()
        self.depthwise_conv = tnn.Conv1d(c, c, 1, groups=c)
        self.depthwise_bn = tnn.BatchNorm1d(c)
        self.pointwise_conv = tnn.Conv1d(c, c, 1)
        self.pointwise_bn = tnn.BatchNorm1d(c)

    def forward(self, x):
        out = torch.relu(self.depthwise_bn(self.depthwise_conv(x)))
        return torch.relu(self.pointwise_bn(self.pointwise_conv(out)))


class _TorchIRB(tnn.Module):
    """InvertedResidualBlock structure (model.py:46-85), in == out."""

    def __init__(self, c, expansion=4):
        super().__init__()
        e = c * expansion
        self.expand = tnn.Sequential(tnn.Conv1d(c, e, 1), tnn.BatchNorm1d(e), tnn.ReLU())
        self.conv = tnn.Sequential(
            _TorchDSConv(e), tnn.BatchNorm1d(e), tnn.ReLU(),
            _TorchDSConv(e), tnn.BatchNorm1d(e),
        )
        self.project = tnn.Sequential(tnn.Conv1d(e, c, 1), tnn.BatchNorm1d(c))
        self.shortcut = tnn.Sequential()

    def forward(self, x):
        out = x.unsqueeze(0).permute(0, 2, 1)
        out = self.project(self.conv(self.expand(out)))
        out = out.permute(0, 2, 1).squeeze(0)
        return torch.relu(out + self.shortcut(x))


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.data = torch.tensor(
                rng.normal(size=m.num_features).astype(np.float32)
            )
            m.running_var.data = torch.tensor(
                rng.uniform(0.5, 2.0, size=m.num_features).astype(np.float32)
            )


def test_mlp_forward_parity(rng):
    tm = _torch_mlp([6, 16, 32]).eval()
    _randomize_bn_stats(tm, rng)
    sd = {f"nn.NN.{k}": v for k, v in tm.state_dict().items()}

    from pointstowood_tpu.utils.checkpoint_convert import _mlp_entries, _set

    # convert manually with the MLP mapping
    conv = convert_torch_state_dict_via_map(sd, _mlp_entries("nn.NN", 2), root="")
    x = rng.normal(size=(40, 6)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()

    mlp = RefMLP((6, 16, 32))
    variables = jax.jit(mlp.init)(jax.random.key(0), jnp.array(x))
    merged = merge_into_variables(variables, conv)
    out = jax.jit(
        lambda v, a: mlp.apply(v, a, use_running_average=True)
    )(merged, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def convert_torch_state_dict_via_map(sd, key_map, root=""):
    """Helper: run the converter restricted to a custom key map."""
    import pointstowood_tpu.utils.checkpoint_convert as cc

    orig = cc.build_key_map
    cc.build_key_map = lambda: key_map
    try:
        return cc.convert_torch_state_dict(sd)
    finally:
        cc.build_key_map = orig


def test_irb_forward_parity(rng):
    c = 8
    tm = _TorchIRB(c).eval()
    _randomize_bn_stats(tm, rng)
    sd = {f"residual_block.{k}": v for k, v in tm.state_dict().items()}

    from pointstowood_tpu.utils.checkpoint_convert import _irb_entries

    conv = convert_torch_state_dict_via_map(sd, _irb_entries("residual_block"))
    x = rng.normal(size=(30, c)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()

    irb = InvertedResidualBlock(c)
    variables = jax.jit(irb.init)(jax.random.key(0), jnp.array(x))
    merged = merge_into_variables(variables, conv)
    out = jax.jit(
        lambda v, a: irb.apply(v, a, use_running_average=True)
    )(merged, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


class _TorchRefNetParams(tnn.Module):
    """Full parameter-structure replica of the reference Net (model.py:204-224)."""

    def __init__(self, C=32):
        super().__init__()

        def gate():
            m = tnn.Module()
            m.fc1 = tnn.Linear(1, 32)
            m.fc2 = tnn.Linear(32, 32)
            m.fc3 = tnn.Linear(32, 1)
            return m

        def sa(in_c, mid_c, out_c):
            m = tnn.Module()
            conv = tnn.Module()
            conv.local_nn = _torch_mlp([in_c, mid_c, out_c])
            m.conv = conv
            m.residual_block = _TorchIRB(out_c)
            m.reflectanceyesno = gate()
            return m

        def fp(widths):
            m = tnn.Module()
            m.NN = _torch_mlp(widths)
            return m

        C4, C8, C16 = C * 4, C * 8, C * 16
        self.stem_mlp = _torch_mlp([3, C])
        self.sa1_module = sa(C + 4, C * 2, C4)
        self.sa2_module = sa(C4 + 4, C * 6, C8)
        self.sa3_module = sa(C8 + 4, C * 12, C16)
        self.sa4_module = fp([C16 + 3, C16, C16])
        self.fp4_module = fp([C * 32, C * 24, C16])
        self.fp3_module = fp([C * 24, C * 20, C16])
        self.fp2_module = fp([C * 20, C16, C16])
        self.fp1_module = fp([C * 17, C16, C16])
        self.conv1 = tnn.Conv1d(C16, C16, 1)
        self.conv2 = tnn.Conv1d(C16, 1, 1)
        self.norm = tnn.BatchNorm1d(C16)


def test_full_net_state_dict_converts_and_loads(rng):
    """Every torch parameter maps onto the flax tree (full coverage both ways)."""
    tm = _TorchRefNetParams(C=32)
    _randomize_bn_stats(tm, rng)
    # add a DataParallel-style prefix to exercise stripping
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    converted = convert_torch_state_dict(sd)

    from pointstowood_tpu.model import Net
    import functools

    net = Net(knn_chunk=64)
    pos = jnp.zeros((1, 128, 3))
    refl = jnp.zeros((1, 128))
    mask = jnp.ones((1, 128), bool)
    sf = jnp.ones((1,))
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, pos, refl, mask, sf
    )

    def leaves_with_paths(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}"
            if isinstance(v, dict):
                out.update(leaves_with_paths(v, p))
            else:
                out[p] = v
        return out

    init_leaves = leaves_with_paths(
        jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    )
    conv_leaves = leaves_with_paths(converted["params"])
    # every converted leaf exists in the model with the same shape
    for path, arr in conv_leaves.items():
        assert path in init_leaves, f"converted leaf {path} unknown to the model"
        assert init_leaves[path].shape == arr.shape, path
    # and every model param was covered by the conversion
    missing = sorted(set(init_leaves) - set(conv_leaves))
    assert not missing, f"model params not covered by converter: {missing[:8]}"

    # batch_stats coverage
    init_bs = leaves_with_paths(
        jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
    )
    conv_bs = leaves_with_paths(converted["batch_stats"])
    assert set(init_bs) == set(conv_bs)

    # merged tree runs end to end
    merged = merge_into_variables(variables, converted)
    out = jax.jit(
        lambda v: net.apply(v, pos, refl, mask, sf, training=False)
    )(merged)
    assert np.isfinite(np.asarray(out)).all()

    # spot-check value mapping: head conv kernel is the transposed squeeze
    w = tm.state_dict()["conv1.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["conv1"]["kernel"]), w[..., 0].T
    )
    rm = tm.state_dict()["norm.running_mean"].numpy()
    np.testing.assert_array_equal(
        np.asarray(merged["batch_stats"]["norm"]["mean"]), rm
    )


def test_load_torch_pth_roundtrip(tmp_path, rng):
    tm = _TorchRefNetParams(C=32)
    path = str(tmp_path / "ref.pth")
    torch.save({"model_state_dict": tm.state_dict()}, path)

    from pointstowood_tpu.utils.checkpoint import load_checkpoint

    converted = load_checkpoint(path)
    assert "params" in converted and "batch_stats" in converted
    assert "stem_mlp" in converted["params"]


def test_roundtrip_torch_to_flax_to_torch(rng):
    """torch sd -> flax -> torch sd is the identity (values and key set)."""
    from pointstowood_tpu.utils.checkpoint_convert import convert_to_torch_state_dict

    tm = _TorchRefNetParams(C=32)
    _randomize_bn_stats(tm, rng)
    sd_in = {k: v.numpy() for k, v in tm.state_dict().items()}
    converted = convert_torch_state_dict(sd_in)
    sd_out = convert_to_torch_state_dict(converted)
    missing = {k for k in sd_in if "num_batches_tracked" not in k} - set(sd_out)
    assert not missing, sorted(missing)[:8]
    for k, v in sd_out.items():
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_array_equal(v, sd_in[k], err_msg=k)


def test_save_torch_checkpoint_loads_in_torch(tmp_path, rng):
    from pointstowood_tpu.utils.checkpoint_convert import save_torch_checkpoint
    import jax
    import functools
    from pointstowood_tpu.model import Net

    net = Net(knn_chunk=64)
    pos = jnp.zeros((1, 128, 3))
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, pos, jnp.zeros((1, 128)),
        jnp.ones((1, 128), bool), jnp.ones((1,)),
    )
    p = str(tmp_path / "exported.pth")
    save_torch_checkpoint(p, variables)
    ckpt = torch.load(p, weights_only=True)
    sd = ckpt["model_state_dict"]
    tm = _TorchRefNetParams(C=32)
    tm.load_state_dict(sd, strict=False)  # shapes/keys accepted by the replica
    # and it converts back into the model losslessly
    back = convert_torch_state_dict(sd)
    out_kernel = np.asarray(variables["params"]["conv1"]["kernel"])
    np.testing.assert_allclose(back["params"]["conv1"]["kernel"], out_kernel, rtol=1e-6)
