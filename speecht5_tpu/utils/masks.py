"""Length/mask utilities.

Canonical internal representation is `lengths: int32[B]`; boolean masks use
True = valid frame (note the reference's fairseq convention is the opposite,
True = padding — conversion happens only at the checkpoint/IO boundary).
"""

from __future__ import annotations

import jax.numpy as jnp


def length_mask(lengths, max_len: int):
    """[B] lengths -> bool[B, max_len], True where position < length."""
    return jnp.arange(max_len, dtype=jnp.int32)[None, :] < lengths[:, None]


def mask_lengths(mask) -> jnp.ndarray:
    """bool[B, T] (True=valid) -> int32[B]."""
    return mask.astype(jnp.int32).sum(axis=-1)


def causal_mask(t: int):
    """bool[t, t], True where j <= i (position j visible from i)."""
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    return j <= i


def attention_bias(mask, dtype=jnp.float32, neg: float = -1e9):
    """bool mask (True=attend) -> additive bias (0 / neg)."""
    return jnp.where(mask, jnp.zeros((), dtype), jnp.full((), neg, dtype))


def combine_masks(*masks):
    """AND-combine optional boolean masks (None entries skipped)."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else jnp.logical_and(out, m)
    return out
