"""Test harness: hermetic CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

import jax  # noqa: E402

# This machine's sitecustomize pre-registers a TPU backend (axon tunnel) in
# every python process with JAX_PLATFORMS=axon; env vars set after interpreter
# start are ignored.  config.update still wins, so force the hermetic
# 8-virtual-device CPU backend here (multi-chip sharding paths run on it).
# The CPU collective rendezvous watchdog (hard abort at 40 s) must be
# relaxed before backend init: on a loaded 1-core host, 8 virtual device
# threads can miss it from scheduling starvation alone.
from gstx.core.mesh import relax_cpu_collective_timeouts  # noqa: E402

relax_cpu_collective_timeouts()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def tiny_configs():
    """Small model configs for fast CPU tests; same topology as production
    (12/6/6 layers shrunk to 2/2/2, hidden sizes shrunk but head structure
    intact).  Single source of truth: fixtures.tiny_enc_dec_configs (also
    imported by subprocess driver scripts)."""
    from fixtures import tiny_enc_dec_configs

    return tiny_enc_dec_configs()
