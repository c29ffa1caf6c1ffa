"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not honored when a TPU plugin (axon) is present;
# the config update is.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-dominated (the slowest
# tests are ~95% XLA:CPU compile), and cache keys are HLO content hashes,
# so re-runs after the first drop from minutes to seconds. Repo-local so
# `git clean` / fresh checkouts start cold. Opt out: RDMNET_TEST_CACHE=0.
if os.environ.get("RDMNET_TEST_CACHE", "1") != "0":
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax_test_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full-model compiles, minutes each)",
    )


def pytest_collection_modifyitems(config, items):
    """Default run = fast suite (<2 min). Slow tests run with --runslow or
    an explicit -m filter."""
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow; run with --runslow or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(7351)


def _demo_scan(name):
    path = f"/root/reference/assets/pc/{name}"
    if not os.path.exists(path):
        pytest.skip("demo scans unavailable")
    return np.load(path)[:, :3].astype(np.float32)


@pytest.fixture
def demo_pair():
    """The two bundled KITTI demo scans (read-only public assets)."""
    return _demo_scan("000000.npy"), _demo_scan("000004.npy")
