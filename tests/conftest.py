"""Test configuration: force the CPU backend with 8 virtual devices.

Tests exercise the identical uint32 kernels that run on TPU; the 8
virtual CPU devices host the multi-chip sharding tests
(tests/test_sharded.py: mesh + collectives, 1-vs-8-device bit-exactness)
without TPU hardware.

IMPORTANT: in the TPU-tunnel environment a sitecustomize hook registers
the remote 'axon' PJRT plugin in EVERY python process at interpreter
start (before this file runs) and all sessions serialize on the single
tunnel.  If that hook already ran, we re-exec the test process with the
tunnel env stripped so tests never touch (or block on) the TPU.  The
re-exec happens in pytest_configure with global capture STOPPED: at
conftest-import time pytest has already dup2'd fds 1/2 into its capture
temp files, and an execve there silently discards all test output
(observed: rc=0, zero bytes).  stop_global_capturing() restores the
real fds first, so the re-exec'd run reports normally.
"""

import os
import sys

# XLA:CPU's LLVM pipeline recurses deeply on the big scan-body programs
# (pairing pow chains) and has segfaulted the default 8MB main-thread
# stack; raise the limit before any native compilation runs.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
except Exception:
    pass

_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and not os.environ.get(
    "_ALGEBRA_TPU_TESTS_REEXEC"
)


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_ALGEBRA_TPU_TESTS_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


if not _NEEDS_REEXEC:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # Pin the ISA so cached XLA:CPU executables reload identically across
    # runs: un-pinned, cache keys/feature checks drift with detected CPU
    # features (historically SIGILL'd on reload; measured 5x slower cache
    # hits even when it survives).  Compile time dominates this suite, so
    # AVX2-only codegen is a non-issue.
    if "xla_cpu_max_isa" not in flags:
        flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
    os.environ["XLA_FLAGS"] = flags

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax  # noqa: E402,F401

    # NO persistent compile cache on XLA:CPU: cached-AOT reload segfaults
    # on this machine even with a single writer, a fresh cache dir, and
    # --xla_cpu_max_isa pinned (observed twice this round: SEGV inside
    # compilation_cache.get_executable_and_time mid-suite).  Cold compiles
    # are slower but the suite actually finishes.

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(12345)
