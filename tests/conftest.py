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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound in-process XLA state across the (large) suite.

    One pytest process compiles hundreds of executables over ~300 tests;
    late-suite XLA:CPU compiles were observed to segfault inside
    backend_compile_and_load with all that state resident (reproducible at
    the same test across full-suite runs, never in module isolation).
    Dropping compiled executables between modules keeps the process lean;
    the persistent disk cache (JAX_COMPILATION_CACHE_DIR above) makes
    re-tracing cheap where shapes repeat.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
