"""VALL-E X codec LM tests (paper-based stretch config, BASELINE.json).

AR stage: causal codebook-0 LM with KV-cache prefill + while_loop generation;
NAR stage: parallel per-codebook prediction; end-to-end synthesize."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from speecht5_tpu.models.vallex import (
    VALLEX, VALLEX_AR, vallex_tiny, init_vallex,
)


@pytest.fixture(scope="module")
def vx():
    cfg = vallex_tiny()
    model, variables = init_vallex(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


class TestAR:
    def test_teacher_forced_shapes(self, vx):
        cfg, m, v = vx
        phonemes = jnp.asarray([[3, 4, 5, cfg.pad_id]])
        prev = jnp.concatenate([
            jnp.full((1, 1), cfg.codebook_size + 1, jnp.int32),  # bos
            jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32),
        ], axis=1)
        logits = m.apply(v, phonemes, prev, method="forward_ar")
        assert logits.shape == (1, 6, cfg.codebook_size + 1)
        assert np.isfinite(np.asarray(logits)).all()

    def test_prefill_matches_stepwise(self, vx):
        """Teacher-forced logits == prefill+step logits (KV-cache parity
        through the multi-token prefill path)."""
        cfg, m, v = vx
        phonemes = jnp.asarray([[3, 4, 5]])
        codes = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        bos = jnp.full((1, 1), cfg.codebook_size + 1, jnp.int32)
        prev = jnp.concatenate([bos, codes], axis=1)
        full = np.asarray(m.apply(v, phonemes, prev, method="forward_ar"))

        # generate() with temperature 0 starting from the full prompt should
        # pick argmax(full[:, -1]) as its first token
        prompt = jnp.tile(codes[:, None, :], (1, cfg.n_codebooks, 1))
        gen, _ = m.apply(v, phonemes, prompt, max_new=3, method="synthesize")
        first = int(np.asarray(full)[0, -1].argmax())
        if first < cfg.codebook_size:  # not eos
            assert int(np.asarray(gen)[0, 0, 0]) == first

    def test_generate_stops_and_is_deterministic(self, vx):
        cfg, m, v = vx
        phonemes = jnp.asarray([[3, 4, 5], [6, 7, cfg.pad_id]])
        prompt = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.codebook_size, (2, 4, 5)),
            jnp.int32,
        )
        syn = jax.jit(lambda vv, p, c: m.apply(
            vv, p, c, max_new=8, method="synthesize"
        ))
        codes, lengths = syn(v, phonemes, prompt)
        codes2, _ = syn(v, phonemes, prompt)
        assert codes.shape == (2, cfg.n_codebooks, 8)
        np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
        assert (np.asarray(codes) < cfg.codebook_size).all()
        assert (np.asarray(lengths) <= 8).all()


class TestNAR:
    def test_stage_prediction_shapes(self, vx):
        cfg, m, v = vx
        phonemes = jnp.asarray([[3, 4, 5]])
        codes = jnp.asarray(
            np.random.default_rng(1).integers(
                0, cfg.codebook_size, (1, cfg.n_codebooks, 6)
            ), jnp.int32,
        )
        for stage in (1, cfg.n_codebooks - 1):
            logits = m.apply(v, phonemes, codes, stage, method="forward_nar")
            assert logits.shape == (1, 6, cfg.codebook_size)

    def test_stage_embedding_changes_output(self, vx):
        cfg, m, v = vx
        phonemes = jnp.asarray([[3, 4, 5]])
        codes = jnp.zeros((1, cfg.n_codebooks, 6), jnp.int32)
        l1 = m.apply(v, phonemes, codes, 1, method="forward_nar")
        l2 = m.apply(v, phonemes, codes, 2, method="forward_nar")
        assert not np.allclose(np.asarray(l1), np.asarray(l2))


class TestTraining:
    def test_ar_nar_losses_descend(self, vx):
        cfg, m, v = vx
        rng = np.random.default_rng(2)
        phonemes = jnp.asarray([[3, 4, 5, 6]])
        codes = jnp.asarray(
            rng.integers(0, cfg.codebook_size, (1, cfg.n_codebooks, 8)),
            jnp.int32,
        )
        bos = jnp.full((1, 1), cfg.codebook_size + 1, jnp.int32)
        prev = jnp.concatenate([bos, codes[:, 0, :-1]], axis=1)

        def loss_fn(params):
            ar_logits = m.apply(
                {"params": params}, phonemes, prev, method="forward_ar"
            )
            lp = jax.nn.log_softmax(ar_logits, axis=-1)
            ar = -jnp.take_along_axis(
                lp, codes[:, 0][..., None], axis=-1
            ).mean()
            nar_logits = m.apply(
                {"params": params}, phonemes, codes, 1, method="forward_nar"
            )
            lp2 = jax.nn.log_softmax(nar_logits, axis=-1)
            nar = -jnp.take_along_axis(
                lp2, codes[:, 1][..., None], axis=-1
            ).mean()
            return ar + nar

        params = v["params"]
        tx = optax.adam(1e-2)
        opt = tx.init(params)
        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        losses = []
        for _ in range(6):
            loss, grads = grad_fn(params)
            updates, opt = tx.update(grads, opt)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
