"""Test harness: force an 8-device CPU platform so multi-chip sharding logic is
exercised without TPU hardware (the TPU-native analogue of multi-node testing —
the reference has none, SURVEY.md section 4).

NOTE: this environment's sitecustomize registers a remote 'axon' TPU backend at
interpreter start, so JAX_PLATFORMS set here is too late — use
jax.config.update, which wins at (lazy) backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Parity tests compare the same math computed through different shapes
# (e.g. KV-cached step decode vs full teacher forcing); reduced matmul
# precision produces ~5e-3 divergence that would mask real bugs.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
