"""Two-pass CTC -> attention-rescore decode.

Covers:
- the open-vocabulary N-best prefix beam (decode/nbest.py) against an
  exhaustive-enumeration CTC oracle and the native C++ implementation
  (csrc/ctc_beam.cpp:ctc_nbest);
- RescoreDecoder (decode/asr.py): shapes, vocab bounds, and the
  ctc_weight=1.0 reduction to the CTC 1-best.

The end-to-end WER gate lives in tests/test_cli.py (ctc_rescore over the
overfit corpus, next to the greedy/lexicon gates).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speecht5_tpu.decode.nbest import ctc_nbest, ctc_nbest_py
from speecht5_tpu.decode.lexicon import NEG_INF, log_add


def _rand_lp(rng, T, V):
    lp = rng.standard_normal((T, V)).astype(np.float32)
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


def _exact_ctc_logprob(lp, labels, blank):
    """Forward-algorithm log P(labels | emissions) — the enumeration oracle."""
    L = len(labels)
    ext = [blank]
    for t in labels:
        ext += [t, blank]
    S = len(ext)
    alpha = np.full((S,), NEG_INF)
    alpha[0] = lp[0, ext[0]]
    if S > 1:
        alpha[1] = lp[0, ext[1]]
    for t in range(1, lp.shape[0]):
        nxt = np.full((S,), NEG_INF)
        for s in range(S):
            a = alpha[s]
            if s >= 1:
                a = log_add(a, alpha[s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                a = log_add(a, alpha[s - 2])
            nxt[s] = a + lp[t, ext[s]]
        alpha = nxt
    out = alpha[S - 1]
    if S > 1:
        out = log_add(out, alpha[S - 2])
    return out


class TestNBestPrefixBeam:
    def test_matches_exhaustive_oracle(self):
        """With a full-width beam, every kept prefix's score equals the
        forward-algorithm CTC probability of that label sequence, and the
        ranking matches exact enumeration of all label sequences."""
        rng = np.random.default_rng(1)
        T, V, blank = 5, 3, 0
        lp = _rand_lp(rng, T, V)
        got = ctc_nbest_py(lp, blank=blank, beam=10_000, nbest=10)

        exact = []
        for L in range(T + 1):
            for labels in itertools.product([1, 2], repeat=L):
                # CTC cannot emit adjacent repeats in fewer frames than
                # needed; the forward algorithm handles that naturally
                exact.append((list(labels),
                              _exact_ctc_logprob(lp, labels, blank)))
        exact.sort(key=lambda kv: -kv[1])

        for (toks, score), (etoks, escore) in zip(got, exact):
            assert toks == etoks
            np.testing.assert_allclose(score, escore, atol=1e-4)

    def test_native_matches_python(self):
        from speecht5_tpu.data import native

        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(2)
        for T, V, beam, nbest, topk in [
            (6, 4, 8, 4, 0), (15, 6, 16, 8, 0), (25, 10, 12, 6, 4),
            (0, 5, 8, 4, 0), (40, 30, 20, 10, 8),
        ]:
            lp = (_rand_lp(rng, T, V) if T
                  else np.zeros((0, V), np.float32))
            a = ctc_nbest(lp, blank=0, beam=beam, nbest=nbest, topk=topk)
            b = ctc_nbest_py(lp, blank=0, beam=beam, nbest=nbest, topk=topk)
            assert len(a) == len(b)
            for (ta, sa), (tb, sb) in zip(a, b):
                assert ta == tb
                np.testing.assert_allclose(sa, sb, atol=1e-4)

    def test_batch_matches_single(self):
        from speecht5_tpu.decode.nbest import ctc_nbest_batch

        rng = np.random.default_rng(3)
        B, Tmax, V = 5, 20, 7
        lp = np.stack([_rand_lp(rng, Tmax, V) for _ in range(B)])
        lens = np.array([20, 13, 1, 20, 7], np.int32)
        got = ctc_nbest_batch(lp, lens, blank=0, beam=10, nbest=4, topk=0,
                              n_threads=2)
        for b in range(B):
            ref = ctc_nbest(lp[b, : lens[b]], blank=0, beam=10, nbest=4)
            assert len(got[b]) == len(ref)
            for (ta, sa), (tb, sb) in zip(got[b], ref):
                assert ta == tb
                np.testing.assert_allclose(sa, sb, atol=1e-6)

    def test_blank_skip_parity_and_quality(self):
        """Blank-dominated frame skipping: native == python, and on peaked
        (trained-model-like) posteriors the 1-best is unchanged vs no-skip."""
        rng = np.random.default_rng(4)
        T, V, blank = 60, 8, 0
        # blank-heavy emission pattern: ~85% blank frames, occasional spikes;
        # jitter breaks exact score ties (std::sort vs sorted() order on
        # tied totals is unspecified and would differ at pruning)
        lp = np.full((T, V), -8.0, np.float32) \
            + rng.uniform(0.0, 0.01, (T, V)).astype(np.float32)
        for t in range(T):
            if rng.random() < 0.85:
                lp[t, blank] = -0.02
            else:
                lp[t, int(rng.integers(1, V))] = -0.05
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        thresh = float(np.log(0.9))
        a = ctc_nbest(lp, blank=blank, beam=12, nbest=6, blank_thresh=thresh)
        b = ctc_nbest_py(lp, blank=blank, beam=12, nbest=6,
                         blank_thresh=thresh)
        for (ta, sa), (tb, sb) in zip(a, b):
            assert ta == tb
            np.testing.assert_allclose(sa, sb, atol=1e-4)
        noskip = ctc_nbest(lp, blank=blank, beam=12, nbest=1)
        assert a[0][0] == noskip[0][0]

    def test_trailing_blank_skip_frames_keep_descending_order(self):
        """Regression (advisor r4): blank-skipped frames AFTER the last
        per-frame sort update scores in place, so a blank-dominated tail
        (trained-model trailing silence) could leave the native N-best
        non-descending and diverging from the Python reference.  The native
        decoder must re-sort before emitting."""
        from speecht5_tpu.data import native

        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(7)
        thresh = float(np.log(0.9))
        for trial in range(40):
            T, V, blank = 24, 6, 0
            lp = _rand_lp(rng, T, V)
            tail = int(rng.integers(5, 13))
            for t in range(T - tail, T):
                row = np.full((V,), -9.0, np.float64)
                row += rng.uniform(0.0, 0.01, V)
                row[blank] = -0.01
                lp[t] = (row - np.log(np.exp(row).sum())).astype(np.float32)
            a = ctc_nbest(lp, blank=blank, beam=8, nbest=8,
                          blank_thresh=thresh)
            scores = [s for _, s in a]
            assert scores == sorted(scores, reverse=True), f"trial {trial}"
            b = ctc_nbest_py(lp, blank=blank, beam=8, nbest=8,
                             blank_thresh=thresh)
            assert [t for t, _ in a] == [t for t, _ in b], f"trial {trial}"
            for (_, sa), (_, sb) in zip(a, b):
                np.testing.assert_allclose(sa, sb, atol=1e-4)

    def test_peaked_posterior_recovers_sequence(self):
        """A near-one-hot emission path decodes to its collapsed labels."""
        V, blank = 5, 0
        frames = [1, 1, 0, 2, 2, 3, 0, 3]
        lp = np.full((len(frames), V), -10.0, np.float32)
        for t, v in enumerate(frames):
            lp[t, v] = -0.01
        best, _ = ctc_nbest(lp, blank=blank, beam=8, nbest=1)[0]
        assert best == [1, 2, 3, 3]


class TestRescoreDecoder:
    def _make(self):
        from speecht5_tpu.config import speecht5_tiny
        from speecht5_tpu.models.speecht5 import init_model

        cfg = speecht5_tiny()
        model, v = init_model(cfg, jax.random.PRNGKey(0))
        return cfg, model, v

    def test_shapes_and_ctc_reduction(self):
        from speecht5_tpu.decode.asr import RescoreDecoder

        cfg, model, v = self._make()
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
        lens = jnp.asarray([4000, 2500])

        dec = RescoreDecoder(
            model, v, blank_id=cfg.blank_id, eos_id=cfg.eos_id,
            pad_id=cfg.pad_id, nbest=4, beam=8, ctc_weight=0.3,
        )
        out = dec(wav, lens)
        assert len(out) == 2
        assert all(0 <= t < cfg.vocab_size for o in out for t in o)

        # ctc_weight=1.0 ignores the decoder pass -> CTC 1-best exactly
        dec1 = RescoreDecoder(
            model, v, blank_id=cfg.blank_id, eos_id=cfg.eos_id,
            pad_id=cfg.pad_id, nbest=4, beam=8, ctc_weight=1.0,
        )
        out1 = dec1(wav, lens)
        _, _, lp, lengths = dec1._enc(dec1.variables, (wav, lens))
        lp, lengths = np.asarray(lp), np.asarray(lengths)
        for b in range(2):
            ref = ctc_nbest(lp[b, : int(lengths[b])], blank=cfg.blank_id,
                            beam=8, nbest=4)[0][0]
            assert out1[b] == ref
