"""Freeze-for-N-updates fine-tuning (reference --freeze-encoder-updates /
--freeze-decoder-updates: sub-nets run under no_grad while num_updates < N —
speech_encoder_prenet.py:151, encoder.py:164-168, transformer_layer.py:289-291;
the CTC projection stays trainable during an encoder freeze,
encoder.py:174-179)."""

import numpy as np
import jax
import jax.numpy as jnp

from speecht5_tpu.config import speecht5_tiny
from speecht5_tpu.models.speecht5 import init_model
from speecht5_tpu.train.trainer import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)


def _batch(rng, B, T=2000, L=6, vocab=40):
    return {
        "wav": jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.1,
        "wav_lengths": jnp.full((B,), T, jnp.int32),
        "prev_tokens": jnp.asarray(rng.integers(4, vocab, (B, L)), jnp.int32),
        "targets": jnp.asarray(rng.integers(4, vocab, (B, L)), jnp.int32),
        "target_lengths": jnp.full((B,), L, jnp.int32),
    }


def _max_abs_delta(a, b):
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        )
    )


def _state(model, variables, tcfg):
    tx = make_optimizer(tcfg)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), extra)


class TestFreezeUpdates:
    def test_encoder_frozen_then_released(self):
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        tcfg = TrainConfig(
            lr=1e-3, warmup_steps=1, ctc_weight=0.5,
            freeze_encoder_updates=1,
        )
        step_fn = jax.jit(make_train_step(model, "s2t", tcfg))
        state = _state(model, variables, tcfg)
        batch = _batch(np.random.default_rng(0), 2, vocab=cfg.vocab_size)

        s1, m1 = step_fn(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m1["loss"]))

        p0, p1 = state.params, s1.params
        enc0 = {k: v for k, v in p0["encoder"].items() if k != "proj"}
        enc1 = {k: v for k, v in p1["encoder"].items() if k != "proj"}
        # step 0 < N=1: prenet + encoder body exactly unchanged
        assert _max_abs_delta(p0["speech_encoder_prenet"],
                              p1["speech_encoder_prenet"]) == 0.0
        assert _max_abs_delta(enc0, enc1) == 0.0
        # CTC head and decoder keep training through the freeze
        assert _max_abs_delta(p0["encoder"]["proj"],
                              p1["encoder"]["proj"]) > 0.0
        assert _max_abs_delta(p0["decoder"], p1["decoder"]) > 0.0

        # frozen leaves keep their Adam moments exactly (no decay drift)
        def adam_mu(opt_state):
            for node in jax.tree_util.tree_leaves(
                opt_state, is_leaf=lambda n: hasattr(n, "mu")
            ):
                if hasattr(node, "mu"):
                    return node.mu
            raise AssertionError("no adam state found")

        assert _max_abs_delta(
            adam_mu(state.opt_state)["speech_encoder_prenet"],
            adam_mu(s1.opt_state)["speech_encoder_prenet"],
        ) == 0.0

        # step 1 >= N=1: encoder trains again
        s2, _ = step_fn(s1, batch, jax.random.PRNGKey(2))
        assert _max_abs_delta(s1.params["speech_encoder_prenet"],
                              s2.params["speech_encoder_prenet"]) > 0.0
        enc1b = {k: v for k, v in s1.params["encoder"].items() if k != "proj"}
        enc2 = {k: v for k, v in s2.params["encoder"].items() if k != "proj"}
        assert _max_abs_delta(enc1b, enc2) > 0.0

    def test_decoder_freeze_covers_decoder_nets(self):
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        tcfg = TrainConfig(
            lr=1e-3, warmup_steps=1, ctc_weight=0.5,
            freeze_decoder_updates=2,
        )
        step_fn = jax.jit(make_train_step(model, "s2t", tcfg))
        state = _state(model, variables, tcfg)
        batch = _batch(np.random.default_rng(1), 2, vocab=cfg.vocab_size)

        s1, _ = step_fn(state, batch, jax.random.PRNGKey(1))
        p0, p1 = state.params, s1.params
        for top in ("decoder", "text_decoder_prenet", "text_decoder_postnet"):
            if top in p0:
                assert _max_abs_delta(p0[top], p1[top]) == 0.0, top
        # encoder side unaffected by a decoder freeze
        assert _max_abs_delta(p0["encoder"], p1["encoder"]) > 0.0

    def test_no_freeze_encoder_layers_exemption(self):
        """reference --no-freeze-encoder-layer: listed encoder layers keep
        training during the freeze window; the rest (and the prenet) stay
        frozen (encoder.py:82-83,254)."""
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        tcfg = TrainConfig(
            lr=1e-3, warmup_steps=1, ctc_weight=0.5,
            freeze_encoder_updates=1, no_freeze_encoder_layers=(1,),
        )
        step_fn = jax.jit(make_train_step(model, "s2t", tcfg))
        state = _state(model, variables, tcfg)
        batch = _batch(np.random.default_rng(3), 2, vocab=cfg.vocab_size)
        s1, _ = step_fn(state, batch, jax.random.PRNGKey(1))
        p0, p1 = state.params, s1.params
        assert _max_abs_delta(p0["encoder"]["layers_1"],
                              p1["encoder"]["layers_1"]) > 0.0
        assert _max_abs_delta(p0["encoder"]["layers_0"],
                              p1["encoder"]["layers_0"]) == 0.0
        assert _max_abs_delta(p0["speech_encoder_prenet"],
                              p1["speech_encoder_prenet"]) == 0.0

    def test_no_freeze_is_default(self):
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        tcfg = TrainConfig(lr=1e-3, warmup_steps=1, ctc_weight=0.5)
        step_fn = jax.jit(make_train_step(model, "s2t", tcfg))
        state = _state(model, variables, tcfg)
        batch = _batch(np.random.default_rng(2), 2, vocab=cfg.vocab_size)
        s1, _ = step_fn(state, batch, jax.random.PRNGKey(1))
        assert _max_abs_delta(state.params["encoder"],
                              s1.params["encoder"]) > 0.0
        assert _max_abs_delta(state.params["decoder"],
                              s1.params["decoder"]) > 0.0
