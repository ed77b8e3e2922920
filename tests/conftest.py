"""Test harness: run everything on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests validate numerics + sharding on CPU
with ``xla_force_host_platform_device_count=8`` so multi-chip code paths
(shard_map/psum over a Mesh) execute without TPU hardware.
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel), and we
# want tests on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
