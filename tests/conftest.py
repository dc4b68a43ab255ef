"""Test configuration: force the CPU backend with 8 virtual devices.

Tests exercise the identical uint32 kernels that run on TPU; the 8
virtual CPU devices validate the multi-chip sharding paths (mesh +
collectives) without TPU hardware.

IMPORTANT: in the TPU-tunnel environment a sitecustomize hook registers
the remote 'axon' PJRT plugin in EVERY python process at interpreter
start (before this file runs) and all sessions serialize on the single
tunnel.  If that hook already ran, we re-exec the test process with the
tunnel env stripped so tests never touch (or block on) the TPU.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "_ALGEBRA_TPU_TESTS_REEXEC"
):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_ALGEBRA_TPU_TESTS_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Persistent compilation cache: the limb-unrolled kernels are expensive to
# compile on the CPU backend; cache across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/atc_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(12345)
