"""Shared prediction-head math used by every HuBERT-style family.

One implementation of the cosine-similarity codebook logits (reference
speech_encoder_postnet.py:56-68 compute_nce, re-derived as plain CE — see
models/postnets.py) instead of per-model copies.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_logits(x, embs, temp: float, eps: float = 1e-8):
    """x: [..., D] projected features; embs: [C, D] label embeddings.

    Returns [..., C] cosine-similarity logits scaled by 1/temp.
    """
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    en = embs / jnp.maximum(jnp.linalg.norm(embs, axis=-1, keepdims=True), eps)
    return jnp.einsum("...d,cd->...c", xn, en) / temp
