"""Test configuration: run JAX on a virtual 8-device CPU platform.

Multi-chip sharding is validated with XLA's host-platform device simulation
(the driver separately dry-runs the multichip path via __graft_entry__).

This environment's sitecustomize registers an axon TPU PJRT plugin at
interpreter start and force-sets the jax_platforms *config* to "axon,cpu",
so env vars alone (JAX_PLATFORMS / XLA_FLAGS) are consumed too early to
help; the config must be overridden directly before any backend
initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
from jax._src import xla_bridge as _xb

if _xb.backends_are_initialized():  # pragma: no cover - depends on boot order
    from jax.extend.backend import clear_backends

    clear_backends()

assert jax.device_count() == 8, (
    f"expected 8 simulated CPU devices, got {jax.devices()}"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(141190)
