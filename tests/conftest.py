"""Test config: hermetic CPU runs with a virtual 8-device mesh.

This is the TPU answer to "test multi-chip without a cluster"
(SURVEY.md §4): XLA exposes N host devices so every sharding/pjit test
exercises real partitioning + collectives.

NOTE: this environment's sitecustomize imports jax and latches
``jax_platforms`` before pytest starts, so the env var alone is not enough —
we must also flip the live config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in flags:
    # XLA:CPU collectives rendezvous by requiring all 8 shard threads of a
    # program to run at once; on few-core CI hosts the late shards can take
    # ~60 s to get pool threads (first-execution warmup), and the default
    # 20 s warn / +40 s terminate window ABORTS the process
    # (rendezvous.cc "Expected 8 threads ... only 1 arrived").  Seen in
    # test_driver_mesh on a 1-core host; give slow hosts 10 minutes.
    # (The finer-grained xla_cpu_collective_call_{warn_stuck,terminate_
    # timeout}_seconds debug options exist in the proto but are not
    # registered for XLA_FLAGS in this jaxlib.)
    flags = flags + " --xla_cpu_collective_timeout_seconds=600"
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compile cache: repeat suite runs skip XLA compiles.
# Partitioned BY HOST CPU FINGERPRINT: XLA:CPU caches AOT machine code, and
# loading an executable compiled on a host with different CPU features
# (this cache directory outlives rounds and machines) aborts the process
# mid-suite ("Fatal Python error: Aborted" via cpu_aot_loader SIGILL).
def _host_tag() -> str:
    import hashlib
    import platform
    import re

    try:
        with open("/proc/cpuinfo") as f:
            m = re.search(r"^flags\s*:\s*(.*)$", f.read(), re.M)
        raw = m.group(1) if m else platform.processor()
    except OSError:
        raw = platform.processor() or platform.machine()
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                          f"cpu-{_host_tag()}")
os.makedirs(_cache_dir, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on the host CPU"
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy suite (whole-pipeline jits); deselect with "
        "-m 'not slow' for the fast (<5 min) feedback loop",
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
