"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

Mesh/collective logic is exercised without TPU hardware, per the multi-device
test strategy in SURVEY.md section 4. Must run before any jax import.
"""

import os

# The session env pins JAX_PLATFORMS=axon (the tunneled TPU); unit tests run
# on the virtual CPU mesh and must override it unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# A site plugin rewrites jax_platforms to "axon,cpu" at import time; pin it
# back to cpu before the backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
