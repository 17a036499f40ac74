"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (the approach recommended
for JAX multi-host testing: --xla_force_host_platform_device_count)."""

import os

# Must be set before jax is imported anywhere. Forced (not setdefault): the
# surrounding environment may point JAX at a TPU platform, but unit tests
# must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import numpy as np
import pytest

# Persistent compile cache: jit compiles on this 1-core box are expensive
# (up to ~1 min); cache them across pytest processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(seed=1234)
