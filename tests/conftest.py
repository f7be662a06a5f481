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


@pytest.fixture
def rng():
    return np.random.default_rng(42)
