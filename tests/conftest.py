"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (the approach recommended
for JAX multi-host testing: --xla_force_host_platform_device_count)."""

import os

# Must be set before jax initializes a backend. Forced (not setdefault): the
# surrounding environment may point JAX at a TPU platform, but unit tests
# must run on the virtual CPU mesh. NOTE: on this image a site hook
# (/root/.axon_site) imports jax before any test code runs, so env vars are
# too late — use jax.config.update, which works post-import as long as no
# backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: jit compiles on this 1-core box are expensive
# (up to ~1 min); cache them across pytest processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(seed=1234)
