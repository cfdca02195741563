"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of standing in for a real cluster with a
LocalCluster on one machine (reference gtsfm/runner/gtsfm_runner_base.py:288-296);
here the stand-in is XLA host-platform virtual devices so multi-chip sharding
code paths execute under `pytest` without TPU hardware.

Must set env vars BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize imports jax at interpreter startup (axon TPU
# tunnel), so env vars alone are TOO LATE — force the platform via config.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: makes repeat test runs fast. Keyed by the host's
# CPU feature set — XLA:CPU persists AOT-compiled machine code, and loading an
# entry produced on a different microarchitecture (VM migration) can execute
# unsupported instructions (SIGILL / hard abort mid-suite).
from gtsfm_tpu.common.cache_dirs import compile_cache_dir

jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
# READ-ONLY persistent cache under pytest: serializing a freshly compiled
# executable (put_executable_and_time -> XLA:CPU AOT export) reproducibly
# SEGFAULTS this environment late in long test processes (r4 — observed at
# different tests across runs, always in the cache-write path; the same
# programs compile and run fine). A write-never threshold keeps warm-cache
# reads (fast repeat suites when a cache was populated by pipeline runs)
# while removing the crashy serialization from the test process entirely.
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    0.0 if os.environ.get("GTSFM_TEST_CACHE_WRITE") else 1e9,
)
# GTSFM_TEST_CACHE_WRITE=1 re-enables writes for SHORT per-module populate
# runs (scripts/populate_test_cache.sh) where the serializer is stable.

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran (order-independence).
    return np.random.default_rng(0)


REFERENCE_DATA = "/root/reference/tests/data"


def reference_data_available() -> bool:
    return os.path.isdir(REFERENCE_DATA)
