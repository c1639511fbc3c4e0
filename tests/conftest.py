# -*- coding: utf-8 -*-
"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware.

Note: this image's sitecustomize force-registers the axon TPU platform and
overrides JAX_PLATFORMS, so the env var alone is not enough — we must also
update jax.config after import."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

from smsut_tpu.utils.cachekey import cache_dir

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: XLA:CPU compiles dominate the suite's wall time
# on this 1-CPU host; repeat runs hit the cache and run ~2x faster.
# Machine-keyed: XLA:CPU AOT blobs from another host risk SIGILL.
jax.config.update("jax_compilation_cache_dir", cache_dir("/tmp/smsut-jax-cache-cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(2020)


@pytest.fixture(autouse=True)
def _reset_norm_stats():
    """setup_compute() resolves Config.norm_stats='auto' per-algorithm and
    sets a module global; reset it so a bf16-stats algo in one test can't
    leak quantized statistics into a later torch-parity test."""
    from smsut_tpu.models import layers

    layers.set_norm_stats("reduce")
    yield
    layers.set_norm_stats("reduce")
