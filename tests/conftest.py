"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the SURVEY §4 implication: tier-1 tests are CPU-capable, and
multi-device sharding is validated with xla_force_host_platform_device_count
(no TPU required).

NOTE: the axon TPU plugin's sitecustomize sets ``jax_platforms="axon,cpu"``
programmatically, which overrides the JAX_PLATFORMS env var — so we must
update jax.config AFTER import, before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
