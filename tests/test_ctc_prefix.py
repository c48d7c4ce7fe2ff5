"""Validate the parallel-scan CTC prefix scorer against a direct numpy
implementation of the standard recursion (Watanabe et al. hybrid CTC/attention)."""

import numpy as np
import jax.numpy as jnp
import pytest

from speecht5_tpu.decode import ctc_prefix


def np_prefix_score(lprobs, prefix, cand, blank):
    """Direct loop implementation: score of prefix + [cand] given lprobs [T, V].

    Returns (psi, r_b[T], r_nb[T]) for the extended prefix.
    Prefix excludes any leading sentinel; empty prefix = [].
    """
    T, V = lprobs.shape
    # forward variables of the *prefix*
    if len(prefix) == 0:
        g_b = np.cumsum(lprobs[:, blank])
        g_nb = np.full(T, -np.inf)
        last = None
    else:
        # recursively compute prefix state
        g_b = np.cumsum(lprobs[:, blank])
        g_nb = np.full(T, -np.inf)
        running_empty = True
        cur_last = None
        for tok in prefix:
            psi, g_b, g_nb = _extend(lprobs, g_b, g_nb, tok, blank,
                                     running_empty, cur_last)
            running_empty = False
            cur_last = tok
        last = prefix[-1]
    return _extend(lprobs, g_b, g_nb, cand, blank, len(prefix) == 0, last)


def _extend(lprobs, g_b, g_nb, c, blank, is_empty, last):
    T = lprobs.shape[0]
    r_b = np.full(T, -np.inf)
    r_nb = np.full(T, -np.inf)
    psi_terms = []
    for t in range(T):
        phi_prev = (
            0.0 if (t == 0 and is_empty)
            else -np.inf if t == 0
            else (g_b[t - 1] if c == last else np.logaddexp(g_b[t - 1], g_nb[t - 1]))
        )
        prev_nb = r_nb[t - 1] if t > 0 else -np.inf
        r_nb[t] = np.logaddexp(prev_nb, phi_prev) + lprobs[t, c]
        prev_b = r_b[t - 1] if t > 0 else -np.inf
        r_b[t] = np.logaddexp(prev_b, prev_nb) + lprobs[t, blank]
        psi_terms.append(phi_prev + lprobs[t, c])
    psi = np.logaddexp.reduce(psi_terms)
    return psi, r_b, r_nb


@pytest.fixture
def lprobs(rng):
    T, V = 12, 6
    x = rng.standard_normal((T, V))
    return (x - np.log(np.exp(x).sum(-1, keepdims=True))).astype(np.float32)


BLANK, EOS = 0, 5


class TestCTCPrefix:
    def test_first_extension_matches_numpy(self, lprobs):
        T, V = lprobs.shape
        state = ctc_prefix.init_state(
            jnp.asarray(lprobs)[None], jnp.asarray([T]), BLANK, EOS
        )
        cands = jnp.asarray([[1, 2, 3]])
        psi, cand_state = ctc_prefix.score_candidates(
            state, jnp.asarray(lprobs)[None], jnp.asarray([T]), cands, BLANK,
            is_empty=jnp.asarray([True]),
        )
        for k, c in enumerate([1, 2, 3]):
            ref_psi, ref_rb, ref_rnb = np_prefix_score(lprobs, [], c, BLANK)
            np.testing.assert_allclose(float(psi[0, k]), ref_psi, atol=1e-4)
            # -inf is represented by the finite sentinel NEG on device
            np.testing.assert_allclose(
                np.asarray(cand_state.r_nb)[0, k],
                np.maximum(ref_rnb, ctc_prefix.NEG), atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(cand_state.r_b)[0, k],
                np.maximum(ref_rb, ctc_prefix.NEG), atol=1e-4,
            )

    def test_second_extension_matches_numpy(self, lprobs):
        T, V = lprobs.shape
        lp = jnp.asarray(lprobs)[None]
        lengths = jnp.asarray([T])
        state = ctc_prefix.init_state(lp, lengths, BLANK, EOS)
        # extend with token 2
        psi, cand_state = ctc_prefix.score_candidates(
            state, lp, lengths, jnp.asarray([[2]]), BLANK, jnp.asarray([True])
        )
        state = ctc_prefix.select(cand_state, np.asarray([0]), np.asarray([0]))
        # now extend with candidates incl. repeat (2) — exercises the phi branch
        cands = [1, 2, 4]
        psi2, _ = ctc_prefix.score_candidates(
            state, lp, lengths, jnp.asarray([cands]), BLANK, jnp.asarray([False])
        )
        for k, c in enumerate(cands):
            ref_psi, _, _ = np_prefix_score(lprobs, [2], c, BLANK)
            np.testing.assert_allclose(float(psi2[0, k]), ref_psi, atol=1e-4)

    def test_three_token_prefix(self, lprobs):
        T, V = lprobs.shape
        lp = jnp.asarray(lprobs)[None]
        lengths = jnp.asarray([T])
        state = ctc_prefix.init_state(lp, lengths, BLANK, EOS)
        prefix = [3, 1, 1]
        empty = True
        for tok in prefix:
            _, cand_state = ctc_prefix.score_candidates(
                state, lp, lengths, jnp.asarray([[tok]]), BLANK,
                jnp.asarray([empty]),
            )
            state = ctc_prefix.select(cand_state, np.asarray([0]), np.asarray([0]))
            empty = False
        psi, _ = ctc_prefix.score_candidates(
            state, lp, lengths, jnp.asarray([[4]]), BLANK, jnp.asarray([False])
        )
        ref_psi, _, _ = np_prefix_score(lprobs, prefix, 4, BLANK)
        np.testing.assert_allclose(float(psi[0, 0]), ref_psi, atol=1e-4)

    def test_eos_score_is_full_sequence_prob(self, lprobs):
        T, V = lprobs.shape
        lp = jnp.asarray(lprobs)[None]
        lengths = jnp.asarray([T])
        state = ctc_prefix.init_state(lp, lengths, BLANK, EOS)
        _, cand_state = ctc_prefix.score_candidates(
            state, lp, lengths, jnp.asarray([[2]]), BLANK, jnp.asarray([True])
        )
        state = ctc_prefix.select(cand_state, np.asarray([0]), np.asarray([0]))
        got = float(ctc_prefix.eos_score(state, lengths)[0])
        _, ref_rb, ref_rnb = np_prefix_score(lprobs, [], 2, BLANK)
        ref = np.logaddexp(ref_rb[-1], ref_rnb[-1])
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_shorter_length_masks_tail(self, lprobs):
        T, V = lprobs.shape
        L = 8
        lp = jnp.asarray(lprobs)[None]
        state = ctc_prefix.init_state(lp, jnp.asarray([L]), BLANK, EOS)
        psi, _ = ctc_prefix.score_candidates(
            state, lp, jnp.asarray([L]), jnp.asarray([[3]]), BLANK,
            jnp.asarray([True]),
        )
        ref_psi, _, _ = np_prefix_score(lprobs[:L], [], 3, BLANK)
        np.testing.assert_allclose(float(psi[0, 0]), ref_psi, atol=1e-4)
