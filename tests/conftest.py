"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip hardware is not available in CI; all sharding tests run on a
virtual CPU mesh (`XLA_FLAGS=--xla_force_host_platform_device_count=8`),
which validates mesh layouts and collectives without real chips.

NOTE: in this environment the axon TPU plugin ignores ``JAX_PLATFORMS``;
``JAX_PLATFORM_NAME`` (and jax.config.update("jax_platforms", ...)) do work.
Running tests against the tunneled TPU would make every eager op pay a
network round-trip (~0.5 s/op).
"""

import os

# Must be set before jax initializes.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
