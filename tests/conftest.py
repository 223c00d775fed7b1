"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars BEFORE jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cofusion_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# 8 virtual CPU devices for sharding tests (the XLA_FLAGS
# --xla_force_host_platform_device_count route no longer works in jax 0.9;
# jax_num_cpu_devices is the supported mechanism)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cofusion_tpu.config import CameraConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_cam() -> CameraConfig:
    """Tiny camera for fast tests (aspect/principal point mimic the default 640x480)."""
    return CameraConfig(width=160, height=128, fx=132.0, fy=132.0, cx=80.0, cy=64.0)


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
