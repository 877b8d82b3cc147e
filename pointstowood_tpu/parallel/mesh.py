"""Device mesh and sharding helpers.

The workload's natural parallelism is pure data parallelism over
independent voxel tiles (the reference is single-GPU; see SURVEY.md §2d):
a 1-D ``('data',)`` mesh shards the batch dimension of tile batches across
chips over ICI, parameters are replicated, and the only training collective
is the gradient psum XLA inserts automatically. Works identically on one
chip, a v5e-8 slice, and the host-platform device simulation used in tests.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(verbose: bool = False) -> bool:
    """Env-gated multi-host bootstrap; returns True when running multi-process.

    The reference is strictly single-GPU so it has nothing here; SURVEY §5
    mandates a first-class distributed backend. Launch each process with

        PTW_COORDINATOR_ADDRESS=host:port  PTW_NUM_PROCESSES=N  PTW_PROCESS_ID=i

    (explicit generic-cluster form) or ``PTW_DISTRIBUTED=auto`` to let
    ``jax.distributed.initialize()`` auto-detect the cluster environment
    (Cloud TPU pods, Slurm, Open MPI). Without any of these env vars the
    call is a no-op — single-process behavior is unchanged. Must run before
    the first backend touch; both CLIs call it first thing in ``main``.

    Idempotent: a second call (e.g. CLI main invoked from a driver that
    already bootstrapped) is a no-op.
    """
    addr = os.environ.get("PTW_COORDINATOR_ADDRESS")
    auto = os.environ.get("PTW_DISTRIBUTED", "").lower() in ("1", "true", "auto")
    if addr is None and not auto:
        return False
    from jax._src import distributed as _dist

    if _dist.global_state.client is None:  # not yet initialized
        kwargs = {}
        if addr is not None:
            kwargs = dict(
                coordinator_address=addr,
                num_processes=int(os.environ["PTW_NUM_PROCESSES"]),
                process_id=int(os.environ["PTW_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kwargs)
    if verbose:
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
            f" local_devices={len(jax.local_devices())}"
            f" global_devices={jax.device_count()}"
        )
    return jax.process_count() > 1


def data_mesh(n_devices: Optional[int] = None) -> Optional[Mesh]:
    """A 1-D data-parallel mesh over the first n_devices (default: all).
    Returns None when only one device is available (plain jit is enough).

    Multi-host: ``jax.devices()`` is the GLOBAL device list, so the same
    call builds the cross-host mesh on a multi-host slice. Devices are
    ordered process-contiguously so each process's addressable devices own
    a contiguous span of the batch dimension (what
    ``put_sharded``/``fetch`` rely on)."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
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


def put_sharded(sharding: NamedSharding, *arrays):
    """Place host arrays with their leading dim sharded over the mesh.

    Single-process: plain device_put. Multi-host: every process holds the
    same GLOBAL batch (the input pipeline is deterministic and hosts are
    fed identically — host preprocessing is ~2% of end-to-end time, so
    duplicating it is the right v1 trade against a distributed tile
    store); each process hands JAX only the rows its own devices own via
    ``make_array_from_process_local_data``.
    """
    if jax.process_count() == 1:
        return tuple(jax.device_put(a, sharding) for a in arrays)
    pi, pc = jax.process_index(), jax.process_count()
    out = []
    for a in arrays:
        a = np.asarray(a)
        per = a.shape[0] // pc
        local = a[pi * per : (pi + 1) * per]
        out.append(
            jax.make_array_from_process_local_data(sharding, local, a.shape)
        )
    return tuple(out)


def fetch(array) -> np.ndarray:
    """Read a device array back to EVERY host in full.

    Replicated or single-process arrays transfer directly; batch-sharded
    multi-host arrays are all-gathered across processes first (fusion
    needs every tile's probabilities on every host)."""
    if jax.process_count() == 1 or getattr(array, "is_fully_replicated", True):
        return np.asarray(array)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(array, tiled=True))


def shard_batch(mesh: Optional[Mesh], *arrays):
    """Device-put arrays with their leading dim sharded over the mesh."""
    if mesh is None:
        return arrays
    return put_sharded(batch_sharding(mesh), *arrays)
