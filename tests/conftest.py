"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count=8 on the CPU backend, which exercises
the same jax.sharding/pjit partitioning logic XLA uses on a real pod slice.
"""

import os
import sys

# Force CPU even when the ambient environment points at a TPU (JAX_PLATFORMS
# may be pre-set); COMET_TEST_PLATFORM overrides for on-hardware test runs.
os.environ["JAX_PLATFORMS"] = os.environ.get("COMET_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Persistent compile cache: XLA-CPU compiles of the big sorting-network
# kernels cost minutes; cache them across test runs (separate dir from the
# TPU cache so backends never cross-pollinate).
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_repo_root, ".jax_cache_cpu")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# The axon sitecustomize may have pre-registered a TPU platform; the config
# API wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update(
    "jax_num_cpu_devices",
    int(os.environ.get("COMET_TEST_CPU_DEVICES", "8")),
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from comet_tpu.core import node as node_mod  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_ids():
    """Each test starts with a fresh global node-ID counter."""
    node_mod._reset_node_id_counter()
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(42)
