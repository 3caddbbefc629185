"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip hardware is not available in CI; all sharding tests run on a
virtual CPU mesh (`XLA_FLAGS=--xla_force_host_platform_device_count=8`),
which validates mesh layouts and collectives without real chips.
"""

import os

# Must be set before jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
