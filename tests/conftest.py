"""Test config: run JAX on CPU with an 8-device virtual mesh.

This is the standard JAX fake-backend analog (SURVEY.md §4): multi-chip
sharding tests run against 8 virtual CPU devices without TPU hardware.

Set ``PRETORCHED_TPU_TESTS=1`` to keep the exported platform instead (the
sandbox exports ``JAX_PLATFORMS=axon``) so the TPU-gated tests — compiled
Pallas kernel runs — execute on the real chip:
``PRETORCHED_TPU_TESTS=1 pytest tests/test_nonlocal.py -k compiled``.
"""

import os

import numpy as np
import pytest

_USE_TPU = bool(os.environ.get('PRETORCHED_TPU_TESTS'))

if not _USE_TPU:
    # The sandbox exports JAX_PLATFORMS=axon (TPU tunnel); override to CPU.
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update('jax_platforms', 'cpu')
    assert jax.default_backend() == 'cpu'


@pytest.fixture
def rng():
    return np.random.RandomState(0)
