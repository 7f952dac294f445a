"""Test session setup: CPU backend with 8 virtual devices + compile cache.

Runs before any test imports jax (SURVEY.md §4: multi-chip tests use the
``xla_force_host_platform_device_count`` fake-backend trick).
"""

import os

from mmmot_tpu.utils.jax_setup import force_cpu, setup_jax

force_cpu(num_devices=8)

import jax  # noqa: E402  (must come after force_cpu)

setup_jax()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
