"""Test env: force an 8-device virtual CPU mesh BEFORE any JAX backend use.

This is the build's "multi-node tests without a cluster" layer (SURVEY.md §4
item 4): mesh sharding / collective tests run deterministically on a
simulated 8-device CPU backend.

Note: on this machine ``jax`` is pre-imported at interpreter startup with
``JAX_PLATFORMS=axon`` (real TPU tunnel), so setting env vars here is too
late for the platform choice — we must go through ``jax.config.update``.
``XLA_FLAGS`` is still read lazily at CPU-backend init, so the host-device
count can be injected via the environment as long as no backend has been
touched yet.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(0)
