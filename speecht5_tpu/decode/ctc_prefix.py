"""Vectorized CTC prefix scoring, fully on device.

The reference's joint CTC/attention decoding uses espnet's ``CTCPrefixScore`` —
dynamic-dict, per-hypothesis numpy on the CPU, forcing batch size 1 and a host
round trip per beam step (reference sequence_generator.py:273-284, 370-418;
SpeechT5/README.md:213 "decoding with joint CTC requires batch=1").

This module removes that bottleneck by reformulating the prefix recursion so it
parallelizes: for an extension c of prefix g, the non-blank forward variable

    r_nb[t] = (r_nb[t-1] + phi[t-1]) * x_c[t]

depends only on phi computed from the *prefix's* stored state, so it is a
first-order linear recurrence with known input — i.e. a cumulative log-sum-exp:

    log r_nb[t] = cx[t] + logcumsumexp_{tau<=t}( log phi[tau-1] - cx[tau-1] )
    with cx[t] = cumsum_s<=t log x_c[s]

and the prefix score is a pure reduction psi = logsumexp_t( phi[t-1] + x_c[t] ).
Both run as parallel scans on the VPU; the whole scorer is O(T * N * K) work
with O(log T) depth, batched over N = batch*beam rows and K candidates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG = -1e30


def _logcumsumexp(x, axis):
    """Numerically-stable cumulative logsumexp via associative scan."""
    def combine(a, b):
        mx = jnp.maximum(a, b)
        mx_safe = jnp.where(jnp.isfinite(mx), mx, 0.0)
        return mx_safe + jnp.log(
            jnp.exp(a - mx_safe) + jnp.exp(b - mx_safe)
        )
    return jax.lax.associative_scan(combine, x, axis=axis)


class CTCPrefixState(NamedTuple):
    """Per-row (batch*beam) prefix state."""

    r_b: jnp.ndarray    # [N, T] log prob of prefix ending in blank at time t
    r_nb: jnp.ndarray   # [N, T] log prob of prefix ending in non-blank at t
    psi: jnp.ndarray    # [N] prefix score so far (log p_ctc(prefix...))
    last: jnp.ndarray   # [N] last emitted token id (eos for empty prefix)


def init_state(ctc_lprobs, lengths, blank_id: int, eos_id: int) -> CTCPrefixState:
    """ctc_lprobs: [N, T, V] log-softmax over encoder frames; lengths: [N]."""
    N, T, _ = ctc_lprobs.shape
    t_idx = jnp.arange(T)[None, :]
    in_range = t_idx < lengths[:, None]
    # pad frames emit blank with prob 1 -> log 1 = 0, so they are transparent
    blank_lp = jnp.where(in_range, ctc_lprobs[:, :, blank_id], 0.0)
    r_b = jnp.cumsum(blank_lp, axis=1)
    r_nb = jnp.full((N, T), NEG)
    return CTCPrefixState(
        r_b=r_b,
        r_nb=r_nb,
        psi=jnp.zeros((N,)),
        last=jnp.full((N,), eos_id, jnp.int32),
    )


def score_candidates(
    state: CTCPrefixState,
    ctc_lprobs,          # [N, T, V]
    lengths,             # [N]
    cand_ids,            # [N, K] candidate token ids
    blank_id: int,
    is_empty,            # [N] bool: prefix is empty (first step)
):
    """Score extending each row's prefix with each candidate.

    ``ctc_lprobs`` may be [N, T, V] (per row) or UNTILED [B, T, V] with
    N = B * beam — beam rows within a group share the posteriors, so the
    grouped form reads them once per sample per step instead of once per
    beam (the dominant gather in the decode loop).

    Returns (psi [N, K] new total prefix scores,
             cand_state: r_b/r_nb arrays [N, K, T] for each candidate).
    """
    N = cand_ids.shape[0]
    NB, T, V = ctc_lprobs.shape
    K = cand_ids.shape[1]
    t_idx = jnp.arange(T)[None, None, :]
    in_range = t_idx < lengths[:, None, None]                      # [N, 1, T]

    # x_c[t]: candidate emission lprobs, -inf on pad frames
    if NB == N:
        xc = jnp.take_along_axis(
            ctc_lprobs, cand_ids[:, None, :], axis=2
        ).transpose(0, 2, 1)                                       # [N, K, T]
        blank_col = ctc_lprobs[:, :, blank_id]                     # [N, T]
    else:
        G = N // NB
        ids = cand_ids.reshape(NB, G * K)
        xc = jnp.take_along_axis(
            ctc_lprobs, ids[:, None, :], axis=2
        ).transpose(0, 2, 1).reshape(N, K, T)
        blank_col = jnp.repeat(ctc_lprobs[:, :, blank_id], G, axis=0)
    xc = jnp.where(in_range, xc, NEG)
    blank_lp = jnp.where(in_range[:, 0, :], blank_col, 0.0)        # [N, T]

    # phi[t] from PREFIX state: r_b + r_nb unless candidate == last token
    same = cand_ids == state.last[:, None]                         # [N, K]
    r_sum = jnp.logaddexp(state.r_b, state.r_nb)                   # [N, T]
    phi = jnp.where(
        same[:, :, None], state.r_b[:, None, :], r_sum[:, None, :]
    )                                                              # [N, K, T]

    # phi_shift[t] = phi[t-1]; t=0 slot: log 1 if prefix empty else -inf
    first = jnp.where(is_empty[:, None], 0.0, NEG)                 # [N, 1]
    phi_shift = jnp.concatenate(
        [jnp.broadcast_to(first[:, None, :], (N, K, 1)), phi[:, :, :-1]], axis=2
    )

    # r_nb[t] = (r_nb[t-1] + phi[t-1]) * xc[t]
    # => log r_nb[t] = CX[t] + logcumsumexp_tau( phi_shift[tau] - CX[tau-1] )
    #    with CX = cumsum(log xc); CX[tau-1] = CX[tau] - xc[tau]
    cx = jnp.cumsum(jnp.where(in_range, xc, 0.0), axis=2)          # [N, K, T]
    z = jnp.where(in_range, phi_shift - cx + xc, NEG)
    r_nb = cx + _logcumsumexp(jnp.maximum(z, NEG), axis=2)
    r_nb = jnp.where(in_range, jnp.maximum(r_nb, NEG), NEG)

    # r_b[t] = (r_b[t-1] + r_nb[t-1]) * x_blank[t]
    # => log r_b[t] = CB[t] + logcumsumexp_tau( r_nb[tau-1] - CB[tau-1] )
    cb = jnp.cumsum(blank_lp, axis=1)[:, None, :]                  # [N, 1, T]
    cb_prev = jnp.concatenate(
        [jnp.zeros((N, 1, 1)), cb[:, :, :-1]], axis=2
    )                                                              # CB[t-1]
    r_nb_prev = jnp.concatenate(
        [jnp.full((N, K, 1), NEG), r_nb[:, :, :-1]], axis=2
    )
    u = jnp.maximum(r_nb_prev - cb_prev, NEG)
    r_b = cb + _logcumsumexp(u, axis=2)
    r_b = jnp.maximum(r_b, NEG)

    # psi = logsumexp_t( phi_shift[t] + xc[t] )  (only over in-range frames)
    psi = jax.scipy.special.logsumexp(
        jnp.where(in_range, phi_shift + xc, NEG), axis=2
    )
    psi = jnp.maximum(psi, NEG)

    return psi, CTCPrefixState(r_b=r_b, r_nb=r_nb, psi=psi, last=cand_ids)


def eos_score(state: CTCPrefixState, lengths):
    """Score of terminating the prefix: log p_ctc(prefix) over full frames
    (espnet: r_sum at the final frame)."""
    N, T = state.r_b.shape
    idx = jnp.clip(lengths - 1, 0, T - 1)
    r_sum = jnp.logaddexp(state.r_b, state.r_nb)
    return jnp.take_along_axis(r_sum, idx[:, None], axis=1)[:, 0]


def select(cand_state: CTCPrefixState, row_idx, cand_idx) -> CTCPrefixState:
    """Gather the chosen candidates' states after beam selection.

    row_idx, cand_idx: [N'] indices into the N rows / K candidates.
    """
    return CTCPrefixState(
        r_b=cand_state.r_b[row_idx, cand_idx],
        r_nb=cand_state.r_nb[row_idx, cand_idx],
        psi=cand_state.psi[row_idx, cand_idx],
        last=cand_state.last[row_idx, cand_idx],
    )
