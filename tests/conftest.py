"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (mirrors the driver's dryrun_multichip environment).

Note: the environment's sitecustomize registers an 'axon' TPU backend and pins
``jax_platforms`` via jax.config — env vars alone don't override it, so we
re-pin to cpu through jax.config here (before any backend initialization).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
