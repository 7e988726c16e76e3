"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the XLA analogue of
multi-GPU simulation the reference cannot do (SURVEY.md §4: torch tests skip
multi-GPU paths without hardware).
"""

import os

# a pytest plugin imports jax before this file runs, so env vars alone are too
# late for jax_platforms — set both the env and the live config.
os.environ["JAX_PLATFORMS"] = "cpu"  # hard-force: the session env pins the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False, help="run slow tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow test: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (model compile) tests")
    config.addinivalue_line(
        "markers",
        "parity: north-star cross-stack parity core (grad/update, full-val "
        "mAP, e2e logits, DCN kernels) — run on every PR via "
        "`pytest -m parity --slow` (~10 min), not just nightly",
    )
    np.random.seed(0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
