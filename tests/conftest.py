"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count=8 on the CPU backend, which exercises
the same jax.sharding/pjit partitioning logic XLA uses on a real pod slice.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
