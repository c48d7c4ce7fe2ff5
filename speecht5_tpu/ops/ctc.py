"""CTC loss as a log-semiring scan (pure XLA).

The reference relies on torch/cudnn ``F.ctc_loss``
(reference criterions/speech_to_text_loss.py:326-335).  Here the standard
forward algorithm runs as a lax.scan over time with the batch and the extended
label axis vectorized — static shapes, padding-aware via per-sample frame and
label lengths.  Validated against torch.nn.functional.ctc_loss in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e30


def ctc_loss(
    log_probs,       # [B, T, V] log-softmax over vocab (blank included)
    logit_lengths,   # [B] valid frames
    labels,          # [B, L] target ids (padding arbitrary beyond label_lengths)
    label_lengths,   # [B]
    blank_id: int = 0,
    zero_infinity: bool = False,
):
    """Per-sample negative log likelihood [B] (sum reduction over frames).

    ``zero_infinity``: zero the loss (and its gradient) for samples whose
    alignment is infeasible (too few frames for the labels), matching
    ``torch.nn.functional.ctc_loss(zero_infinity=True)`` — the reference ASR
    fine-tune recipe passes ``--zero-infinity``
    (reference SpeechT5/README.md:178, speech_to_text_loss.py:326-335)."""
    B, T, V = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1

    # extended label sequence: blank z1 blank z2 ... zL blank
    ext = jnp.full((B, S), blank_id, labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    is_blank = jnp.arange(S)[None, :] % 2 == 0
    # skip transition allowed when z_s != blank and z_s != z_{s-2}
    prev2 = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=blank_id)
    can_skip = (~is_blank) & (ext != prev2)
    s_in_range = jnp.arange(S)[None, :] < (2 * label_lengths[:, None] + 1)

    # emission lprobs per extended position: [B, T, S]
    emit = jnp.take_along_axis(
        log_probs, ext[:, None, :].astype(jnp.int32), axis=2
    )

    alpha0 = jnp.full((B, S), NEG)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, emit[:, 0, 1], NEG)
    )

    def step(alpha, te):
        t, emit_t = te
        a_prev1 = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)), constant_values=NEG)
        a_prev2 = jnp.pad(alpha[:, :-2], ((0, 0), (2, 0)), constant_values=NEG)
        a = jnp.logaddexp(alpha, a_prev1)
        a = jnp.where(can_skip, jnp.logaddexp(a, a_prev2), a)
        a = a + emit_t
        a = jnp.where(s_in_range, a, NEG)
        # frames beyond a sample's length leave alpha unchanged
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, a, alpha), None

    # time-major emissions as scan xs (native leading-axis slicing) and a
    # 16x unroll: the per-iteration body is tiny ([B, S]) so TPU scan
    # overhead dominates an un-unrolled loop — profiled at base-ASR training
    # shapes the CTC scan was the largest single cost of the train step
    emit_t = jnp.transpose(emit, (1, 0, 2))  # [T, B, S]
    alpha, _ = jax.lax.scan(
        step, alpha0, (jnp.arange(1, T), emit_t[1:]), unroll=16
    )

    # total prob: last blank or last label position
    end = 2 * label_lengths  # index of final blank
    a_end = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_end1 = jnp.take_along_axis(
        alpha, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    a_end1 = jnp.where(label_lengths > 0, a_end1, NEG)
    ll = jnp.logaddexp(a_end, a_end1)
    nll = -ll
    if zero_infinity:
        # infeasible alignments surface as nll ~ -NEG (1e30); a feasible
        # sample can't come within 20 orders of magnitude of that
        nll = jnp.where(nll >= -0.25 * NEG, 0.0, nll)
    return nll
