"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run before any jax import. Note: the `JAX_PLATFORMS` env var alone is
NOT honored in this environment (the axon TPU plugin still registers), so we
force the platform through jax.config as well.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
