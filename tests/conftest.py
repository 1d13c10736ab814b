"""Test-suite configuration.

Runs the whole suite on CPU with 8 virtual devices so that (a) Pallas
kernels execute in interpreter mode without a TPU and (b) multi-chip
sharding tests exercise a real 8-device mesh (the standard JAX fake-mesh
mechanism; the reference has no distributed tests at all, SURVEY.md §4).

Note: the ambient environment pins a TPU PJRT plugin that overrides
JAX_PLATFORMS at import, so the platform must be forced through
jax.config after import.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(123)
