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


def cpu_subprocess_env(device_count: int = 8):
    """Hermetic environment for CPU-platform subprocess workers.

    The parent test session's TPU-plugin sitecustomize exports session
    state (_AXON_REGISTERED, AXON_POOL_SVC_OVERRIDE, the plugin dir on
    PYTHONPATH) that makes CHILD interpreters attach to the parent's
    remote-TPU relay at startup — and block forever when the pool is
    unreachable, even with JAX_PLATFORMS=cpu.  Subprocess tests must not
    depend on TPU-pool health: strip every plugin variable and pin the
    CPU platform.
    """
    import os as _os

    env = dict(_os.environ)
    for k in list(env):
        if k.startswith(("AXON_", "PALLAS_AXON", "_AXON")):
            env.pop(k)
    pp = [p for p in env.get("PYTHONPATH", "").split(_os.pathsep)
          if p and "axon" not in p]
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env["PYTHONPATH"] = _os.pathsep.join([repo] + pp)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={device_count}"
    return env
