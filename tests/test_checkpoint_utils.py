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


class TestBestMetric:
    """fairseq --best-checkpoint-metric / checkpoint_best.pt semantics
    (reference SpeechT5/README.md:205: s2t_accuracy selection; :119,208:
    keep-last retention)."""

    def _mgr(self, path, **kw):
        return CheckpointManager(str(path), best_metric="wer", **kw)

    def test_best_selection_minimize(self, tmp_path):
        mgr = self._mgr(tmp_path / "ck")
        model = {"params": {"w": np.zeros((2,))}}
        assert mgr.save_best(1, {"wer": 0.5, "loss": 3.0}, model=model)
        assert not mgr.save_best(2, {"wer": 0.6}, model=model)   # worse
        assert mgr.save_best(3, {"wer": 0.4}, model=model)       # better
        assert not mgr.save_best(4, {"loss": 1.0}, model=model)  # metric absent
        mgr.wait()
        assert mgr.best_step == 3 and mgr.best_value == 0.4
        restored, step = mgr.restore_best_model(model)
        assert step == 3
        np.testing.assert_allclose(restored["params"]["w"], np.zeros((2,)))

    def test_best_selection_maximize(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"), best_metric="accuracy",
                                maximize_best=True)
        model = {"params": {"w": np.ones((2,))}}
        assert mgr.save_best(1, {"accuracy": 0.7}, model=model)
        assert not mgr.save_best(2, {"accuracy": 0.6}, model=model)
        assert mgr.save_best(3, {"accuracy": 0.9}, model=model)
        mgr.wait()
        assert mgr.best_step == 3

    def test_best_value_survives_resume(self, tmp_path):
        mgr = self._mgr(tmp_path / "ck")
        model = {"params": {"w": np.zeros((3,))}}
        mgr.save_best(5, {"wer": 0.31}, model=model)
        mgr.wait()
        # a fresh manager over the same dir recovers the incumbent best
        mgr2 = self._mgr(tmp_path / "ck")
        assert mgr2.best_value == pytest.approx(0.31)
        assert mgr2.best_step == 5
        assert not mgr2.save_best(6, {"wer": 0.35}, model=model)
        assert mgr2.save_best(7, {"wer": 0.30}, model=model)
        mgr2.wait()

    def test_interval_retention_keeps_last_n(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=3)
        model = {"params": {"w": np.zeros((1,))}}
        for s in range(1, 7):
            mgr.save_model_only(s, model)
        mgr.wait()
        assert sorted(mgr.mngr.all_steps()) == [4, 5, 6]

    def test_best_survives_interval_retention(self, tmp_path):
        """The best/ checkpoint is NOT garbage-collected by the interval
        manager's keep-last policy (fairseq keeps checkpoint_best.pt
        alongside the rotating epoch checkpoints)."""
        mgr = self._mgr(tmp_path / "ck", max_to_keep=2)
        model = {"params": {"w": np.full((1,), 7.0)}}
        mgr.save_best(1, {"wer": 0.2}, model=model)
        for s in range(2, 8):
            mgr.save_model_only(s, model)
        mgr.wait()
        assert sorted(mgr.mngr.all_steps()) == [6, 7]
        restored, step = mgr.restore_best_model(model)
        assert step == 1
        np.testing.assert_allclose(restored["params"]["w"], [7.0])
