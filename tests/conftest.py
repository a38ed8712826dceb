"""Test configuration: force the CPU backend with 8 virtual devices.

Tests must run without TPU hardware (tier parity with the reference's
no-GPU test strategy, SURVEY.md §4) and exercise the multi-chip sharding
path on a fake 8-device mesh.

Env vars alone are not enough here: the environment's sitecustomize
registers the axon TPU backend and overrides ``JAX_PLATFORMS``, so the
platform is pinned via ``jax.config`` before any backend initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    # Backends already initialized (e.g. a plugin touched them); the env
    # vars above are then the only lever and tests that need 8 devices
    # will skip via the mesh8 fixture.
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def integrator():
    from tpu_montecarlo import MonteCarloIntegrator

    return MonteCarloIntegrator()


@pytest.fixture(scope="session")
def mesh8():
    from tpu_montecarlo.parallel import default_mesh

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return default_mesh(devices[:8])
