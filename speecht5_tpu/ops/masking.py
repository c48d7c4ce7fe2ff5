"""HuBERT-style span masking with JAX PRNG, fully on device.

The reference computes mask indices in numpy on the host and copies them to the
device every step (reference speech_encoder_prenet.py:234-272 ->
fairseq compute_mask_indices, with `torch.from_numpy(...).to(x.device)` at :248).
Here the masks are sampled on device with a keyed PRNG: no host round trip,
deterministic under jit, and distributionally equivalent:

- per sample, num_spans = floor(mask_prob * length / span_len + u), u~U[0,1)
  (matching fairseq "static" selection), at least ``min_masks``;
- span starts drawn uniformly without replacement from [0, length - span_len]
  via the Gumbel-top-k trick (uniform scores -> uniform sample w/o replacement);
- the mask is the union of the spans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_span_mask(
    rng,
    lengths,
    max_len: int,
    mask_prob: float,
    span_len: int,
    min_masks: int = 2,
):
    """Sample bool[B, max_len] span masks; True = masked.  Only positions
    < lengths are ever masked."""
    B = lengths.shape[0]
    r_counts, r_starts = jax.random.split(rng)

    usable = jnp.maximum(lengths - span_len, 1)
    u = jax.random.uniform(r_counts, (B,))
    num_spans = jnp.floor(mask_prob * lengths.astype(jnp.float32) / span_len + u).astype(
        jnp.int32
    )
    num_spans = jnp.maximum(num_spans, min_masks)
    max_spans = int(mask_prob * max_len / span_len) + min_masks + 1
    num_spans = jnp.minimum(num_spans, max_spans)

    # uniform sample-without-replacement of span starts in [0, usable):
    # random scores per position, keep top max_spans, gate by num_spans.
    scores = jax.random.uniform(r_starts, (B, max_len))
    pos_ok = jnp.arange(max_len)[None, :] < usable[:, None]
    scores = jnp.where(pos_ok, scores, -1.0)
    _, starts = jax.lax.top_k(scores, max_spans)  # [B, max_spans]
    active = jnp.arange(max_spans)[None, :] < num_spans[:, None]

    t = jnp.arange(max_len)[None, None, :]
    s = starts[:, :, None]
    in_span = (t >= s) & (t < s + span_len) & active[:, :, None]
    mask = in_span.any(axis=1)
    return mask & (jnp.arange(max_len)[None, :] < lengths[:, None])


def apply_feature_masks(
    rng,
    x,
    lengths,
    mask_emb,
    *,
    mask_prob: float,
    mask_length: int,
    mask_channel_prob: float = 0.0,
    mask_channel_length: int = 10,
    min_masks: int = 2,
):
    """Apply HuBERT time masking (replace with mask_emb) and channel masking
    (zero out channel spans).  Returns (x, time_mask[B, T])."""
    B, T, C = x.shape
    r_time, r_chan = jax.random.split(rng)
    time_mask = compute_span_mask(r_time, lengths, T, mask_prob, mask_length, min_masks)
    x = jnp.where(time_mask[:, :, None], mask_emb.astype(x.dtype)[None, None, :], x)
    if mask_channel_prob > 0:
        chan_lengths = jnp.full((B,), C, dtype=jnp.int32)
        chan_mask = compute_span_mask(
            r_chan, chan_lengths, C, mask_channel_prob, mask_channel_length, 0
        )
        x = jnp.where(chan_mask[:, None, :], jnp.zeros((), x.dtype), x)
    return x, time_mask
