"""Test configuration: force the CPU backend with 8 virtual devices.

Must run before jax is imported anywhere.  Tests exercise the identical
uint32 kernels that run on TPU; the 8 virtual CPU devices validate the
multi-chip sharding paths (mesh + collectives) without TPU hardware.
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

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(12345)
