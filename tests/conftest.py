"""Test configuration: CPU backend with 8 virtual devices (to exercise the
multi-chip sharding paths without TPU hardware) and float64 enabled (parity
mode — the reference is all double precision).

Note: this environment preloads jax at interpreter startup (sitecustomize)
with JAX_PLATFORMS=axon, so the platform must be overridden through
jax.config, not os.environ."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
