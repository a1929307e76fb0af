"""Test configuration: force the CPU backend with 8 virtual devices so
multi-device sharding tests run without TPU hardware (the JAX analog of a
fake distributed backend, which the reference lacks — SURVEY.md §4).

Note: the env-var JAX_PLATFORMS is overridden by the site-installed TPU
plugin, so the platform must be forced via jax.config *after* import and
*before* any backend initialization. This also keeps pytest from claiming
the (single-client) TPU while a benchmark runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
