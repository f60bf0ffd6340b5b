"""Test config: run JAX on CPU with an 8-device virtual mesh.

This is the standard JAX fake-backend analog (SURVEY.md §4): multi-chip
sharding tests run against 8 virtual CPU devices without TPU hardware.
"""

import os

# The sandbox exports JAX_PLATFORMS=axon (TPU tunnel); hard-override to CPU.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == 'cpu'


@pytest.fixture
def rng():
    return np.random.RandomState(0)
