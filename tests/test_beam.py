"""Beam search core tests with a synthetic scoring model (no network)."""

import numpy as np
import jax
import jax.numpy as jnp
import itertools

from speecht5_tpu.decode.beam_search import beam_search, NEG_INF

V = 6
EOS = 2


def table_step_fn(table):
    """Deterministic lprobs that depend only on step: table [L, V]."""

    def step_fn(toks_t, step, state):
        lp = jnp.broadcast_to(table[step][None, :], (toks_t.shape[0], V))
        return lp, state

    return step_fn


class TestBeamCore:
    def test_greedy_sequence(self):
        # step 0: token 3 best; step 1: token 4 best; step 2: eos best
        table = np.full((4, V), -10.0, np.float32)
        table[0, 3] = -0.1
        table[1, 4] = -0.2
        table[2, EOS] = -0.1
        table[3, EOS] = -0.1
        res = beam_search(
            table_step_fn(jnp.asarray(table)), {},
            batch_size=2, beam_size=3, vocab_size=V, max_len=4,
            eos_id=EOS, length_penalty=1.0, min_len=1,
        )
        best = np.asarray(res.tokens)[0, 0]
        # position 0 is bos(=eos), then 3, 4, eos
        assert best[1] == 3 and best[2] == 4 and best[3] == EOS
        assert int(res.lengths[0, 0]) == 4
        # both batch rows identical
        np.testing.assert_array_equal(
            np.asarray(res.tokens)[0], np.asarray(res.tokens)[1]
        )

    def test_matches_exhaustive(self):
        """Beam (full width) must find the true best-scoring sequence under
        fairseq-style normalization."""
        rng = np.random.default_rng(3)
        L = 3
        table = rng.standard_normal((L, V)).astype(np.float32)
        table = table - np.log(np.exp(table).sum(-1, keepdims=True))

        # exhaustive: sequences of length l in 1..L ending with eos at step l-1
        best_score, best_seq = -1e9, None
        toks = [t for t in range(V) if t != EOS]
        for l in range(1, L + 1):
            for seq in itertools.product(toks, repeat=l - 1):
                score = sum(table[i, seq[i]] for i in range(l - 1))
                score += table[l - 1, EOS]
                norm = score / l
                if norm > best_score:
                    best_score, best_seq = norm, seq + (EOS,)

        res = beam_search(
            table_step_fn(jnp.asarray(table)), {},
            batch_size=1, beam_size=V - 1, vocab_size=V, max_len=L,
            eos_id=EOS, length_penalty=1.0, min_len=1,
        )
        got = np.asarray(res.tokens)[0, 0]
        got_len = int(res.lengths[0, 0])
        np.testing.assert_allclose(float(res.scores[0, 0]), best_score, atol=1e-5)
        assert tuple(got[1:got_len]) == best_seq

    def test_min_len(self):
        table = np.full((4, V), -5.0, np.float32)
        table[:, EOS] = -0.01  # eos always best
        table[:, 3] = -1.0
        res = beam_search(
            table_step_fn(jnp.asarray(table)), {},
            batch_size=1, beam_size=2, vocab_size=V, max_len=4,
            eos_id=EOS, length_penalty=1.0, min_len=3,
        )
        # eos banned while fewer than 3 real tokens emitted (fairseq
        # `step < min_len`): best hypothesis is exactly bos + 3 tokens + eos
        best = np.asarray(res.tokens)[0, 0]
        assert int(res.lengths[0, 0]) == 5
        assert all(t != EOS for t in best[1:4]) and best[4] == EOS

    def test_state_reorder(self):
        """model_state rows must follow their beams through reordering."""
        # lprobs depend on per-row state so reordering mistakes change scores
        def step_fn(toks_t, step, state):
            lp = jnp.full((toks_t.shape[0], V), -8.0)
            # reward continuing with the same token as the row's id token
            lp = lp.at[jnp.arange(toks_t.shape[0]), state["fav"]].set(-0.5)
            lp = lp.at[:, EOS].set(-2.0)
            return lp, state

        fav = jnp.asarray([3, 4, 5, 3, 4, 5])  # B=2, K=3
        res = beam_search(
            step_fn, {"fav": fav},
            batch_size=2, beam_size=3, vocab_size=V, max_len=3,
            eos_id=EOS, length_penalty=1.0, min_len=1,
        )
        assert res.tokens.shape == (2, 3, 4)
        # beams should emit their fav tokens; top beam for batch0 starts 3
        seq = np.asarray(res.tokens)[0, 0]
        assert seq[1] in (3, 4, 5)


class TestGroupedCrossAttention:
    def test_grouped_matches_tiled(self, rng):
        """Beam-grouped cross attention (untiled K/V) must equal the tiled
        computation row for row."""
        import jax
        from speecht5_tpu.models.attention import MultiheadAttention

        B, K, Tq, Tk, D, H = 2, 3, 1, 7, 16, 4
        mod = MultiheadAttention(D, H)
        x_q = jnp.asarray(rng.standard_normal((B * K, Tq, D)), jnp.float32)
        enc = jnp.asarray(rng.standard_normal((B, Tk, D)), jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x_q[:1, :, :])
        kv = mod.apply(variables, enc, method="precompute_kv")
        kv_tiled = {k: jnp.repeat(v, K, axis=0) for k, v in kv.items()}
        valid = jnp.asarray([[True] * 7, [True] * 4 + [False] * 3])
        valid_tiled = jnp.repeat(valid, K, axis=0)

        out_g, w_g, _ = mod.apply(
            variables, x_q, cross_kv=kv, key_valid=valid,
            return_weights=True,
        )
        out_t, w_t, _ = mod.apply(
            variables, x_q, cross_kv=kv_tiled, key_valid=valid_tiled,
            return_weights=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_g), np.asarray(out_t), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(w_g), np.asarray(w_t), atol=1e-6
        )


class TestEnsembleDecode:
    """Ensemble beam decode (reference sequence_generator.py EnsembleModel
    :819-961): decoder log-probs averaged in probability space, CTC
    posteriors from the first model."""

    def _make(self, seed):
        from speecht5_tpu.config import speecht5_tiny
        from speecht5_tpu.models.speecht5 import init_model

        cfg = speecht5_tiny()
        return cfg, *init_model(cfg, jax.random.PRNGKey(seed))

    def test_duplicate_ensemble_equals_single(self):
        from speecht5_tpu.decode.asr import ASRDecoder

        cfg, model, v = self._make(0)
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
        lengths = jnp.asarray([4000, 2500])
        single = ASRDecoder(model, v, beam_size=3, max_len=8, ctc_weight=0.3)
        double = ASRDecoder(model, [v, v], beam_size=3, max_len=8,
                            ctc_weight=0.3)
        a = single(wav, lengths)
        b = double(wav, lengths)
        np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
        np.testing.assert_allclose(
            np.asarray(a.scores), np.asarray(b.scores), atol=1e-4
        )

    def test_two_model_ensemble_runs(self):
        from speecht5_tpu.decode.asr import ASRDecoder

        cfg, model, v1 = self._make(0)
        _, _, v2 = self._make(1)
        rng = np.random.default_rng(1)
        wav = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
        lengths = jnp.asarray([4000, 4000])
        dec = ASRDecoder(model, [v1, v2], beam_size=3, max_len=8,
                         ctc_weight=0.3)
        res = dec(wav, lengths)
        assert np.isfinite(np.asarray(res.scores)).all()
        assert (np.asarray(res.lengths) >= 1).all()


class TestAncestryCacheReorder:
    """Gather-free beam cache: keeping the KV caches unpermuted and indexing
    them through the ancestor map must decode EXACTLY like physically
    gathering the caches each step (the attention matmul consumes the same
    values in the same order either way)."""

    def test_ancestry_matches_gather(self):
        from speecht5_tpu.config import speecht5_tiny
        from speecht5_tpu.models.speecht5 import init_model
        from speecht5_tpu.decode.asr import ASRDecoder

        cfg = speecht5_tiny()
        model, v = init_model(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        wav = jnp.asarray(rng.standard_normal((3, 4000)), jnp.float32) * 0.1
        lengths = jnp.asarray([4000, 2500, 3000])
        kw = dict(beam_size=4, max_len=12, ctc_weight=0.3, min_len=3)
        a = ASRDecoder(model, v, cache_reorder="gather", **kw)(wav, lengths)
        b = ASRDecoder(model, v, cache_reorder="ancestry", **kw)(wav, lengths)
        np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
        np.testing.assert_array_equal(
            np.asarray(a.lengths), np.asarray(b.lengths))
        np.testing.assert_allclose(
            np.asarray(a.scores), np.asarray(b.scores), atol=1e-5, rtol=1e-5)

    def test_ancestry_no_ctc(self):
        from speecht5_tpu.config import speecht5_tiny
        from speecht5_tpu.models.speecht5 import init_model
        from speecht5_tpu.decode.asr import ASRDecoder

        cfg = speecht5_tiny()
        model, v = init_model(cfg, jax.random.PRNGKey(2))
        rng = np.random.default_rng(3)
        wav = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
        lengths = jnp.asarray([4000, 4000])
        kw = dict(beam_size=3, max_len=10, ctc_weight=0.0)
        a = ASRDecoder(model, v, cache_reorder="gather", **kw)(wav, lengths)
        b = ASRDecoder(model, v, cache_reorder="ancestry", **kw)(wav, lengths)
        np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
        np.testing.assert_allclose(
            np.asarray(a.scores), np.asarray(b.scores), atol=1e-5, rtol=1e-5)


class TestStepsPerIter:
    def test_unrolled_matches_single(self):
        """steps_per_iter unrolls K cond-guarded decode steps per while_loop
        iteration (amortizing per-iteration backend overhead); every value
        must produce bit-identical tokens/lengths and equal scores, including
        max_len not divisible by the unroll factor."""
        from speecht5_tpu.config import speecht5_tiny
        from speecht5_tpu.models.speecht5 import init_model
        from speecht5_tpu.decode.asr import ASRDecoder

        cfg = speecht5_tiny()
        model, v = init_model(cfg, jax.random.PRNGKey(4))
        rng = np.random.default_rng(5)
        wav = jnp.asarray(rng.standard_normal((3, 4000)), jnp.float32) * 0.1
        lengths = jnp.asarray([4000, 2500, 3000])
        kw = dict(beam_size=4, max_len=13, ctc_weight=0.3, min_len=3)
        ref = ASRDecoder(model, v, steps_per_iter=1, **kw)(wav, lengths)
        for k in (3, 4):
            got = ASRDecoder(model, v, steps_per_iter=k, **kw)(wav, lengths)
            np.testing.assert_array_equal(
                np.asarray(ref.tokens), np.asarray(got.tokens))
            np.testing.assert_array_equal(
                np.asarray(ref.lengths), np.asarray(got.lengths))
            np.testing.assert_allclose(
                np.asarray(ref.scores), np.asarray(got.scores),
                atol=1e-5, rtol=1e-5)


class TestLMFusion:
    """Shallow LM fusion inside the jitted beam loop (reference fairseq
    lm_model branch: lprobs += lm_weight * lm_lprobs)."""

    def _setup(self, lm_seed=3):
        from dataclasses import replace
        from speecht5_tpu.config import speecht5_tiny
        from speecht5_tpu.models.speecht5 import init_model
        from speecht5_tpu.models.lm import TransformerLM, lm_tiny

        cfg = speecht5_tiny()
        model, v = init_model(cfg, jax.random.PRNGKey(0))
        lmcfg = replace(lm_tiny(), vocab_size=cfg.vocab_size,
                        pad_id=cfg.pad_id)
        lm = TransformerLM(lmcfg)
        lm_v = lm.init(jax.random.PRNGKey(lm_seed),
                       jnp.zeros((1, 8), jnp.int32))
        return cfg, model, v, lm, lm_v

    def test_lm_changes_decode(self):
        from speecht5_tpu.decode.asr import ASRDecoder

        cfg, model, v, lm, lm_v = self._setup()
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
        lengths = jnp.asarray([4000, 2500])
        base = ASRDecoder(model, v, beam_size=3, max_len=8, ctc_weight=0.3)
        fused = ASRDecoder(model, v, beam_size=3, max_len=8, ctc_weight=0.3,
                           lm=lm, lm_variables=lm_v, lm_weight=0.5)
        a, b = base(wav, lengths), fused(wav, lengths)
        assert np.isfinite(np.asarray(b.scores)).all()
        assert not np.array_equal(np.asarray(a.tokens), np.asarray(b.tokens))

    def test_dominant_lm_reproduces_lm_greedy(self):
        """With lm_weight >> 1 and beam 1, the beam must walk the LM's own
        greedy path (pad/blank suppressed like the decoder does)."""
        from speecht5_tpu.decode.asr import ASRDecoder

        cfg, model, v, lm, lm_v = self._setup()
        rng = np.random.default_rng(1)
        wav = jnp.asarray(rng.standard_normal((1, 4000)), jnp.float32) * 0.1
        lengths = jnp.asarray([4000])
        L = 6
        dec = ASRDecoder(model, v, beam_size=1, max_len=L, ctc_weight=0.0,
                         lm=lm, lm_variables=lm_v, lm_weight=50.0,
                         min_len=L - 1)
        res = dec(wav, lengths)
        got = np.asarray(res.tokens)[0, 0]

        # roll the LM greedily by hand from the same BOS (= eos id),
        # suppressing pad/blank (+ eos while step < min_len, as beam does)
        cache = lm.apply(lm_v, 1, L + 1, method="init_cache")
        tok = jnp.full((1, 1), cfg.eos_id, jnp.int32)
        want = [cfg.eos_id]
        for step in range(L):
            logits, cache = lm.apply(lm_v, tok, cache, method="decode_step")
            lp = np.array(jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1))[0].copy()
            lp[cfg.pad_id] = -np.inf
            lp[cfg.blank_id] = -np.inf
            if step < L - 1 - 1:
                lp[cfg.eos_id] = -np.inf
            # the beam force-terminates every live hypothesis with EOS at
            # max_len; mirror it
            nxt = cfg.eos_id if step == L - 1 else int(lp.argmax())
            want.append(nxt)
            if nxt == cfg.eos_id:
                break
            tok = jnp.full((1, 1), nxt, jnp.int32)
        n = len(want)
        np.testing.assert_array_equal(got[:n], want)
