"""Test environment: force a virtual 8-device CPU platform BEFORE jax import.

This is the TPU answer to "test multi-chip without a pod slice"
(SURVEY.md section 4): all sharding/pjit tests run against a fake 8-device mesh.
"""

import os

# Force CPU even if the shell pre-sets JAX_PLATFORMS (e.g. axon/TPU): unit
# tests must not grab the TPU tunnel.  The axon sitecustomize overrides the
# env var via jax.config, so we must override it back after importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

from speech_enhancement_clskd_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
