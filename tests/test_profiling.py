"""PhaseTimer / trace utilities (SURVEY.md 5.1 tracing subsystem)."""

import time

import numpy as np
import jax.numpy as jnp

from speecht5_tpu.utils.profiling import PhaseTimer, annotate


class TestPhaseTimer:
    def test_accumulates_phases(self):
        pt = PhaseTimer("t", verbose=False)
        pt.phase("a")
        time.sleep(0.02)
        pt.phase("b")
        time.sleep(0.01)
        pt.phase("a")
        time.sleep(0.02)
        rep = pt.report()
        assert set(rep) == {"a", "b"}
        assert rep["a"] >= 0.03 and rep["b"] >= 0.008
        assert pt.counts["a"] == 2
        s = pt.summary()
        assert "a:" in s and "n=2" in s

    def test_fence_blocks_on_device_value(self):
        pt = PhaseTimer("t", verbose=False)
        pt.phase("compute")
        x = jnp.ones((256, 256)) @ jnp.ones((256, 256))
        pt.phase(None, fence=x)
        assert pt.report()["compute"] > 0

    def test_annotate_contextmanager(self):
        with annotate("region"):
            _ = jnp.ones((4,)) + 1
