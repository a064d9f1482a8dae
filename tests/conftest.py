"""Test configuration.

Tests always run on CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the driver separately dry-runs
the multichip path, and bench.py runs on the real chip).

NOTE: this image preimports jax via a sitecustomize with
``JAX_PLATFORMS=axon`` (TPU tunnel), so env vars set here are too late —
we must go through ``jax.config`` before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses spawned by tests

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: the per-module clear_caches below (segfault
# guard) otherwise forces cross-module recompiles; with the disk cache
# those become fast deserializations.
jax.config.update(
    "jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (stress/fuzz/perf suites); "
        "the CI/driver mode.  RUN_SLOW=1 in the environment works too.",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow suite — run with --runslow (or RUN_SLOW=1)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The XLA:CPU JIT reproducibly SEGFAULTS on a *fresh* compile late in
    a long single process (~600 accumulated compiled programs; the same
    compile succeeds in a fresh process — observed twice at the same
    suite position, moving to the next-compiled program when the
    original op was rewritten).  Bounding live-executable accumulation
    to one module's worth keeps the full suite far from the cliff, at
    the cost of cross-module recompiles.
    """
    yield
    jax.clear_caches()


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
