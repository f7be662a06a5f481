"""Test config: fake an 8-device CPU mesh (SURVEY.md §4.2 #5).

Env vars must be set before jax imports. Set RADIOFRAME_TEST_TPU=1 to run the
suite on real TPU devices instead (kernel tests then compile for real).
"""

import os

if not os.environ.get("RADIOFRAME_TEST_TPU"):
    # The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon baked
    # in, so plain env vars are too late here — use jax.config directly.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full-coverage mode)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (interpret-mode Pallas sharding, 4096-channel "
        "scale, digital modes); excluded by default so the default suite fits "
        "a CI budget — enable with --runslow or RADIOFRAME_RUNSLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RADIOFRAME_RUNSLOW"):
        return
    skip = pytest.mark.skip(reason="slow: pass --runslow (or RADIOFRAME_RUNSLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
