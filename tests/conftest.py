"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is only used by bench.py; tests must pass anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests run on CPU
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# the axon site hook forces its platform regardless of the env var; override
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
