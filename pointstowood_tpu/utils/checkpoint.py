"""Checkpoint save/load.

Native format is flax msgpack bytes holding the full variable collection
{'params': ..., 'batch_stats': ...} — the functional analogue of the
reference's ``{'model_state_dict': state_dict}`` torch files
(reference: pointstowood/src/trainer.py:82,306). Torch ``.pth`` checkpoints
from the reference are converted on load via
pointstowood_tpu.utils.checkpoint_convert (including ``module.`` prefix
stripping, trainer.py:70-73 / predicter.py:100-103).
"""

from __future__ import annotations

import os

import flax.serialization


def save_checkpoint(path: str, variables) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            flax.serialization.to_state_dict(variables)
        ))


def load_checkpoint(path: str):
    """Load a native msgpack checkpoint or convert a torch .pth one."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from pointstowood_tpu.utils.checkpoint_convert import load_torch_checkpoint

        return load_torch_checkpoint(path)
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())
