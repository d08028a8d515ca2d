"""Test configuration.

Force JAX onto the host CPU backend with 8 virtual devices so multi-chip
sharding (shard_map, halo exchange, psum) is exercised without TPU hardware
(SURVEY.md §4.4), and enable x64 so device code can be validated bit-for-
tolerance against the float64 oracle.
"""

import os
import tempfile

# Hermetic operator disk cache: tests exercise the cache code path but never
# share artifacts across sessions (stale-artifact hazard after code changes).
os.environ["SHM3D_CACHE_DIR"] = tempfile.mkdtemp(prefix="shm3d-cache-")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may pre-register an experimental TPU platform plugin that
# overrides JAX_PLATFORMS env selection; jax.config wins over both.  Tests
# must run on the 8-virtual-device CPU backend (SURVEY.md §4.4) with real
# float64 (TPU f64 emulation has f32 range and NaNs on large squares).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

from shm3d.geometry.procedural import make_icosphere  # shared fixture builder


@pytest.fixture(scope="session")
def icosphere():
    return make_icosphere(2)


@pytest.fixture(scope="session")
def small_icosphere():
    return make_icosphere(1)


REFERENCE_DATA = "/root/reference/data"


def reference_asset(name: str) -> str:
    path = os.path.join(os.environ.get("SHM3D_DATA", REFERENCE_DATA), name)
    if not os.path.exists(path):
        pytest.skip(f"reference data asset {name} not available")
    return path
