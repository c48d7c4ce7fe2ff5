"""Checkpoint utilities: task pruning, averaging, averaged-eval path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speecht5_tpu.config import speecht5_tiny
from speecht5_tpu.models.speecht5 import init_model
from speecht5_tpu.utils.checkpoint import (
    CheckpointManager, prune_for_task, average_checkpoints, TASK_MODULES,
)


class TestPruneForTask:
    def test_s2t_drops_speech_decoder(self):
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        pruned = prune_for_task(variables, "s2t")
        p = pruned["params"]
        assert "speech_encoder_prenet" in p and "text_decoder_prenet" in p
        assert "speech_decoder_prenet" not in p
        assert "speech_decoder_postnet" not in p
        assert "speech_encoder_postnet" not in p  # pretrain-only head
        # t2s keeps the speech decoder, drops the text decoder
        pruned_t2s = prune_for_task(variables, "t2s")
        assert "speech_decoder_prenet" in pruned_t2s["params"]
        assert "text_decoder_prenet" not in pruned_t2s["params"]

    def test_all_tasks_defined(self):
        for task in ("s2t", "t2s", "s2s", "s2c"):
            assert task in TASK_MODULES


class TestAveraging:
    def test_uniform_average(self):
        trees = [
            {"a": np.full((2,), float(i)), "b": {"c": np.full((3,), 2.0 * i)}}
            for i in range(1, 4)
        ]
        avg = average_checkpoints(trees)
        np.testing.assert_allclose(avg["a"], [2.0, 2.0])
        np.testing.assert_allclose(avg["b"]["c"], [4.0] * 3)

    def test_save_restore_average(self, tmp_path):
        """Multiple model-only saves -> restore each -> average params."""
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "ck"))
        for s in (1, 2):
            scaled = jax.tree_util.tree_map(
                lambda x: x * float(s), variables
            )
            mgr.save_model_only(s, scaled)
        mgr.wait()
        steps = sorted(mgr.mngr.all_steps())
        assert steps == [1, 2]
        trees = [mgr.restore_model(variables, step=s)[0] for s in steps]
        avg = average_checkpoints([t["params"] for t in trees])
        ref = variables["params"]["encoder"]["layer_norm"]["scale"]
        got = avg["encoder"]["layer_norm"]["scale"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref) * 1.5,
                                   rtol=1e-6)
