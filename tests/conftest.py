"""Test configuration: run JAX on a virtual 8-device CPU platform.

Multi-chip sharding is validated with XLA's host-platform device simulation
(the driver separately dry-runs the multichip path via __graft_entry__).
These env vars must be set before jax is imported anywhere.
"""

import os

# Force CPU even when the environment pre-sets a TPU platform (e.g.
# JAX_PLATFORMS=axon): unit tests must not depend on real TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(141190)
