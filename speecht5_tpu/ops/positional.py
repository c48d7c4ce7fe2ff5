"""Positional encodings.

Two sinusoidal conventions coexist in the reference and must be kept distinct
for checkpoint parity:

1. fairseq ``SinusoidalPositionalEmbedding`` (used by the speech encoder prenet's
   "sinc pos" and the text decoder prenet, reference speech_encoder_prenet.py:122-125,
   text_decoder_prenet.py): half-sin/half-cos *concatenated*, positions offset by
   ``padding_idx + 1``, pad positions get position ``padding_idx``.
2. espnet ``PositionalEncoding``/``ScaledPositionalEncoding`` (used by the text
   encoder prenet and speech decoder prenet, reference text_encoder_prenet.py:12-13):
   sin/cos *interleaved*, positions start at 0; the Scaled variant adds
   ``alpha * pe`` with a learned scalar ``alpha``.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def fairseq_sinusoidal_table(num_embeddings: int, dim: int, padding_idx: int = 1) -> np.ndarray:
    """fairseq-convention sinusoidal table [num_embeddings, dim] (numpy, static)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freq = np.exp(np.arange(half, dtype=np.float64) * -emb)
    pos = np.arange(num_embeddings, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_embeddings, 1))], axis=1)
    if padding_idx is not None:
        table[padding_idx, :] = 0.0
    return table.astype(np.float32)


def fairseq_positions_from_mask(valid_mask, padding_idx: int = 1):
    """Position ids fairseq-style: pad -> padding_idx, else padding_idx + cumsum."""
    valid = valid_mask.astype(jnp.int32)
    return padding_idx + jnp.cumsum(valid, axis=-1) * valid


def fairseq_sinusoidal(valid_mask, dim: int, padding_idx: int = 1):
    """[B, T] valid mask -> [B, T, dim] fairseq sinusoidal positions."""
    T = valid_mask.shape[-1]
    table = jnp.asarray(fairseq_sinusoidal_table(padding_idx + 1 + T, dim, padding_idx))
    pos = fairseq_positions_from_mask(valid_mask, padding_idx)
    return table[pos]


def espnet_sinusoidal_table(max_len: int, dim: int) -> np.ndarray:
    """espnet-convention table [max_len, dim]: interleaved sin/cos from position 0."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(math.log(10000.0) / dim))
    table = np.zeros((max_len, dim))
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return table.astype(np.float32)


def espnet_sinusoidal(T: int, dim: int, offset: int = 0):
    """[T, dim] espnet positions starting at ``offset`` (for incremental decode)."""
    table = jnp.asarray(espnet_sinusoidal_table(offset + T, dim))
    return table[offset:offset + T]
