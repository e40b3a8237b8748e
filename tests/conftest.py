"""Test environment bootstrap.

Tests run on CPU with 8 virtual devices (sharding tests need a mesh without
TPU hardware). On machines with the axon TPU tunnel, its sitecustomize calls
``axon.register.register`` at interpreter start, which programmatically sets
``jax_platforms = "axon,cpu"`` — overriding any JAX_PLATFORMS env var and
making the first backend init claim the remote TPU (minutes of latency).
Undoing it in-process with ``jax.config.update`` before any computation runs
restores fast local CPU execution.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (interpret-mode Pallas kernels, "
             "multi-process, end-to-end mapper loops)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: minutes-long test (interpret-mode Pallas / "
        "multi-process / e2e); excluded from the default gate, run with "
        "--runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
