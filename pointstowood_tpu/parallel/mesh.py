"""Device mesh and sharding helpers.

The workload's natural parallelism is pure data parallelism over
independent voxel tiles (the reference is single-GPU; see SURVEY.md §2d):
a 1-D ``('data',)`` mesh shards the batch dimension of tile batches across
chips over ICI, parameters are replicated, and the only training collective
is the gradient psum XLA inserts automatically. Works identically on one
chip, a v5e-8 slice, and the host-platform device simulation used in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: Optional[int] = None) -> Optional[Mesh]:
    """A 1-D data-parallel mesh over the first n_devices (default: all).
    Returns None when only one device is available (plain jit is enough)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) <= 1 and n_devices is None:
        return None
    return Mesh(np.array(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], *arrays):
    """Device-put arrays with their leading dim sharded over the mesh."""
    if mesh is None:
        return arrays
    s = batch_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)
