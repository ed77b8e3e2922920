"""Test harness: run everything on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests validate numerics + sharding on CPU
with ``xla_force_host_platform_device_count=8`` so multi-chip code paths
(shard_map/psum over a Mesh) execute without TPU hardware.
"""

import os
import sys

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel), and we
# want tests on the virtual CPU mesh regardless.
#
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon sitecustomize hook (triggered by PALLAS_AXON_POOL_IPS) registers
# and INITIALIZES the axon PJRT backend at interpreter start — before this
# conftest runs — which pins jax to the 1-device TPU tunnel no matter what
# we set here (and a wedged tunnel then deadlocks the whole suite on the
# first jax call). If jax was already imported that way, evict the
# non-CPU backend factories and re-init so the suite gets its 8-device
# virtual CPU mesh back.
if "jax" in sys.modules:
    import jax
    from jax._src import xla_bridge

    xla_bridge._clear_backends()
    for _name in list(xla_bridge._backend_factories):
        if _name != "cpu":
            del xla_bridge._backend_factories[_name]
            # Keep the evicted platform "known" so later imports (e.g.
            # pallas) can still register tpu MLIR lowering rules.
            xla_bridge._experimental_plugins.add(_name)
    xla_bridge._experimental_plugins.add("tpu")
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
