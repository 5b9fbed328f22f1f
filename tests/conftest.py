r"""Pytest config: forces JAX onto a virtual 8-device CPU platform so the
mesh/pjit logic is exercised without a TPU (the reference has no distributed
tests — SURVEY.md §4; this tier is new). Must run before jax initializes."""
import os

os.environ.setdefault("XLA_FLAGS",
                      os.environ.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow tests")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: mark test as slow to run")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
