"""Test configuration.

Tests always run on CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the driver separately dry-runs
the multichip path, and bench.py runs on the real chip).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import pytest


@pytest.fixture(autouse=True)
def _seed_prng():
    random.seed(1234)
    yield


@pytest.fixture
def quiet_trace():
    """Silence the global auto-printing logger inside a test."""
    from linalg_solver_tpu.utils.trace import nest_logger

    with nest_logger() as lg:
        yield lg
