"""Torch .pth -> flax checkpoint conversion.

Maps the reference Net's state_dict (reference: pointstowood/src/model.py:
204-224 for the module tree; saved as {'model_state_dict': ...} at
trainer.py:82,306) onto this package's flax parameter tree, including
BatchNorm running statistics. ``module.`` prefixes from historical
DataParallel training are stripped (trainer.py:70-73, predicter.py:100-103)
and loading is lenient like the reference's strict=False inference load
(predicter.py:104): missing keys keep their initialized values, unexpected
keys are ignored.

Layout conversions:
  torch Linear weight (out, in)        -> flax Dense kernel (in, out)
  torch Conv1d k=1 weight (out, in, 1) -> flax Dense kernel (in, out)
  torch depthwise Conv1d k=1 (C, 1, 1) -> per-channel scale (C,)
  torch BN weight/bias/running_mean/var -> scale/bias + batch_stats mean/var
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _lin(np_w, np_b):
    return {"kernel": np_w.T, "bias": np_b}


def _mlp_entries(torch_prefix: str, n_layers: int) -> Dict[str, Tuple[str, str]]:
    """Reference MLP(channels) key map: block i (1-based) is
    Seq(Lin, ReLU[, BN]) at index i-1; BN present for i != 1 at slot 2."""
    out = {}
    for i in range(1, n_layers + 1):
        out[f"{torch_prefix}.{i-1}.0"] = ("linear", f"lin{i}")
        if i != 1:
            out[f"{torch_prefix}.{i-1}.2"] = ("bn", f"bn{i}")
    return out


def _irb_entries(torch_prefix: str) -> Dict[str, Tuple[str, str]]:
    """InvertedResidualBlock map (model.py:46-85). flax submodule names are
    relative to the residual_block module."""
    p = torch_prefix
    return {
        f"{p}.expand.0": ("conv1d", "expand"),
        f"{p}.expand.1": ("bn", "expand_bn"),
        f"{p}.conv.0.depthwise_conv": ("depthwise", "ds1"),
        f"{p}.conv.0.depthwise_bn": ("bn", "ds1/dw_bn"),
        f"{p}.conv.0.pointwise_conv": ("conv1d", "ds1/pw"),
        f"{p}.conv.0.pointwise_bn": ("bn", "ds1/pw_bn"),
        f"{p}.conv.1": ("bn", "mid_bn"),
        f"{p}.conv.3.depthwise_conv": ("depthwise", "ds2"),
        f"{p}.conv.3.depthwise_bn": ("bn", "ds2/dw_bn"),
        f"{p}.conv.3.pointwise_conv": ("conv1d", "ds2/pw"),
        f"{p}.conv.3.pointwise_bn": ("bn", "ds2/pw_bn"),
        f"{p}.conv.4": ("bn", "out_bn"),
        f"{p}.project.0": ("conv1d", "project"),
        f"{p}.project.1": ("bn", "project_bn"),
    }


def build_key_map() -> Dict[str, Tuple[str, str]]:
    """torch module path -> (kind, flax path) for the reference Net."""
    m: Dict[str, Tuple[str, str]] = {}
    m.update(_mlp_entries("stem_mlp", 1))
    m = {k: (kind, f"stem_mlp/{path}") for k, (kind, path) in m.items()}
    for i in (1, 2, 3):
        sa = f"sa{i}_module"
        for k, (kind, path) in _mlp_entries(f"{sa}.conv.local_nn", 2).items():
            m[k] = (kind, f"{sa}/conv/local_nn/{path}")
        for k, (kind, path) in _irb_entries(f"{sa}.residual_block").items():
            m[k] = (kind, f"{sa}/residual_block/{path}")
        for fc in ("fc1", "fc2", "fc3"):
            m[f"{sa}.reflectanceyesno.{fc}"] = ("linear", f"{sa}/reflectanceyesno/{fc}")
    for k, (kind, path) in _mlp_entries("sa4_module.NN", 2).items():
        m[k] = (kind, f"sa4_module/{path}")
    for i in (4, 3, 2, 1):
        for k, (kind, path) in _mlp_entries(f"fp{i}_module.NN", 2).items():
            m[k] = (kind, f"fp{i}_module/{path}")
    m["conv1"] = ("conv1d", "conv1")
    m["conv2"] = ("conv1d", "conv2")
    m["norm"] = ("bn", "norm")
    return m


def _set(tree: dict, path: str, leaf_name: str, value: np.ndarray):
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf_name] = value


def convert_torch_state_dict(state_dict) -> dict:
    """Convert a reference state_dict (tensors or ndarrays) into
    {'params': ..., 'batch_stats': ...} nested dicts of numpy arrays."""
    sd = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32,
        )
        sd[key] = arr

    key_map = build_key_map()
    params: dict = {}
    batch_stats: dict = {}
    for torch_path, (kind, flax_path) in key_map.items():
        w = sd.get(f"{torch_path}.weight")
        b = sd.get(f"{torch_path}.bias")
        if w is None and b is None:
            continue  # lenient: missing block keeps initialized values
        if kind == "linear":
            _set(params, flax_path, "kernel", w.T)
            if b is not None:
                _set(params, flax_path, "bias", b)
        elif kind == "conv1d":
            _set(params, flax_path, "kernel", w[..., 0].T)
            if b is not None:
                _set(params, flax_path, "bias", b)
        elif kind == "depthwise":
            _set(params, flax_path, "dw_scale", w.reshape(-1))
            if b is not None:
                _set(params, flax_path, "dw_bias", b)
        elif kind == "bn":
            _set(params, flax_path, "scale", w)
            _set(params, flax_path, "bias", b)
            rm = sd.get(f"{torch_path}.running_mean")
            rv = sd.get(f"{torch_path}.running_var")
            if rm is not None:
                _set(batch_stats, flax_path, "mean", rm)
            if rv is not None:
                _set(batch_stats, flax_path, "var", rv)
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth ({'model_state_dict': ...} or a bare
    state_dict) and convert it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_torch_state_dict(state_dict)


def _get(tree: dict, path: str):
    node = tree
    for part in path.split("/"):
        if node is None or part not in node:
            return None
        node = node[part]
    return node


def convert_to_torch_state_dict(variables: dict) -> dict:
    """flax variables -> reference-layout torch state_dict (numpy values).

    Inverse of convert_torch_state_dict: produces the exact key set the
    reference Net's state_dict has (model.py:204-224), so models trained
    here can be loaded back into the PyTorch reference. Returns numpy
    arrays; wrap with torch.save({'model_state_dict':
    {k: torch.tensor(v) for k, v in sd.items()}}, path) to write a .pth.
    """
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    sd: dict = {}
    for torch_path, (kind, flax_path) in build_key_map().items():
        p = _get(params, flax_path)
        if p is None:
            continue
        if kind == "linear":
            sd[f"{torch_path}.weight"] = np.asarray(p["kernel"]).T
            if "bias" in p:
                sd[f"{torch_path}.bias"] = np.asarray(p["bias"])
        elif kind == "conv1d":
            sd[f"{torch_path}.weight"] = np.asarray(p["kernel"]).T[..., None]
            if "bias" in p:
                sd[f"{torch_path}.bias"] = np.asarray(p["bias"])
        elif kind == "depthwise":
            sd[f"{torch_path}.weight"] = np.asarray(p["dw_scale"]).reshape(-1, 1, 1)
            sd[f"{torch_path}.bias"] = np.asarray(p["dw_bias"])
        elif kind == "bn":
            sd[f"{torch_path}.weight"] = np.asarray(p["scale"])
            sd[f"{torch_path}.bias"] = np.asarray(p["bias"])
            b = _get(batch_stats, flax_path)
            if b is not None:
                sd[f"{torch_path}.running_mean"] = np.asarray(b["mean"])
                sd[f"{torch_path}.running_var"] = np.asarray(b["var"])
                sd[f"{torch_path}.num_batches_tracked"] = np.asarray(0)
    return sd


def save_torch_checkpoint(path: str, variables: dict) -> None:
    """Write a reference-compatible .pth from flax variables."""
    import torch

    sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in convert_to_torch_state_dict(variables).items()
    }
    torch.save({"model_state_dict": sd}, path)


def merge_into_variables(variables: dict, converted: dict) -> dict:
    """Overlay converted values onto an initialized variable tree (lenient:
    anything absent in ``converted`` keeps its initialized value; shape
    mismatches raise)."""
    import jax.numpy as jnp

    def overlay(init_node, conv_node, path=""):
        if not isinstance(init_node, dict):
            if init_node.shape != conv_node.shape:
                raise ValueError(
                    f"shape mismatch at {path}: checkpoint "
                    f"{conv_node.shape} vs model {init_node.shape}"
                )
            return jnp.asarray(conv_node, dtype=init_node.dtype)
        out = {}
        for k, v in init_node.items():
            if conv_node is not None and k in conv_node:
                out[k] = overlay(v, conv_node[k], f"{path}/{k}")
            else:
                out[k] = v
        return out

    import flax

    init = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)
    return {
        "params": overlay(init["params"], converted.get("params", {})),
        "batch_stats": overlay(init["batch_stats"], converted.get("batch_stats", {})),
    }
