"""FastText2Unit (SpeechLM-P T2U tokenizer) tests.

Reference: SpeechLM/speechlm/models/fasttext2unit.py:23-226 (model),
speechlm/criterions/fasttext2unit_loss.py:58-140 (loss),
speechlm/generate_unit.py (NAR generation)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from speecht5_tpu.models.fastspeech2 import (
    FastText2Unit, fastspeech2_tiny, init_fastspeech2, length_regulate,
)
from speecht5_tpu.train.criterions import fasttext2unit_loss

PAD = 1


class TestLengthRegulator:
    def test_matches_numpy_repeat(self, rng):
        B, T, D, L = 2, 5, 3, 16
        x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
        dur = jnp.asarray([[2, 0, 3, 1, 2], [1, 1, 1, 0, 0]], jnp.int32)
        out, lens, valid = length_regulate(x, dur, L)
        for b in range(B):
            want = np.repeat(np.asarray(x[b]), np.asarray(dur[b]), axis=0)
            n = want.shape[0]
            assert int(lens[b]) == n
            np.testing.assert_allclose(np.asarray(out[b, :n]), want, rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(out[b, n:]), 0.0)
            assert np.asarray(valid[b]).sum() == n

    def test_overflow_clamped(self, rng):
        x = jnp.ones((1, 3, 2))
        dur = jnp.asarray([[10, 10, 10]], jnp.int32)
        out, lens, valid = length_regulate(x, dur, 8)
        assert int(lens[0]) == 8
        assert np.asarray(valid).all()


@pytest.fixture(scope="module")
def t2u():
    cfg = fastspeech2_tiny()
    model, variables = init_fastspeech2(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


class TestFastText2Unit:
    def test_forward_with_gt_durations(self, t2u):
        cfg, model, variables = t2u
        toks = jnp.asarray([[4, 5, 6, PAD], [7, 8, PAD, PAD]])
        dur = jnp.asarray([[2, 3, 1, 0], [4, 2, 0, 0]], jnp.int32)
        logits, lens, valid, log_dur = model.apply(
            variables, toks, durations=dur
        )
        assert logits.shape == (2, cfg.max_target_len, cfg.unit_vocab_size)
        assert lens.tolist() == [6, 6]
        assert log_dur.shape == toks.shape
        assert np.isfinite(np.asarray(logits)).all()

    def test_generate_uses_predicted_durations(self, t2u):
        cfg, model, variables = t2u
        toks = jnp.asarray([[4, 5, 6, 7]])
        gen = jax.jit(lambda v, t: model.apply(v, t, method="generate"))
        units, lens, valid = gen(variables, toks)
        units2, lens2, _ = gen(variables, toks)
        np.testing.assert_array_equal(np.asarray(units), np.asarray(units2))
        assert units.shape == (1, cfg.max_target_len)
        # d_factor scales duration: longer output with d_factor > 1
        u3, lens3, _ = model.apply(
            variables, toks, method="generate", d_factor=4.0
        )
        assert int(lens3[0]) >= int(lens[0])

    def test_loss_and_overfit_step(self, t2u):
        """Loss is finite and a few Adam steps reduce it (learnable signal
        through the regulated gather)."""
        cfg, model, variables = t2u
        rng = np.random.default_rng(0)
        toks = jnp.asarray([[4, 5, 6, 7], [8, 9, 4, PAD]])
        dur = jnp.asarray([[2, 1, 3, 2], [1, 2, 2, 0]], jnp.int32)
        L = cfg.max_target_len
        units = jnp.asarray(
            rng.integers(2, cfg.unit_vocab_size, (2, L)), jnp.int32
        )
        src_valid = toks != PAD

        def loss_fn(params):
            logits, lens, valid, log_dur = model.apply(
                {"params": params}, toks, durations=dur
            )
            loss, metrics = fasttext2unit_loss(
                logits, valid, units, log_dur, dur, src_valid,
                label_smoothing=0.1,
            )
            return loss, metrics

        params = variables["params"]
        tx = optax.adam(1e-2)
        opt = tx.init(params)
        losses = []
        step = jax.jit(
            lambda p, o: (jax.value_and_grad(loss_fn, has_aux=True)(p), o)
        )
        for _ in range(8):
            ((loss, metrics), grads), _ = step(params, opt)
            updates, opt = tx.update(grads, opt)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert "dur_loss" in metrics
