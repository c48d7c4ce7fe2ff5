"""Decoder-only transformer language model for shallow fusion.

Behavioral spec: the reference registers a 20-layer fairseq transformer_lm
(d=1280, ffn=6144, h=16; reference models/t5_transformer_lm.py:16-25) and adds
``lm_weight * lm_lprobs`` to the beam scores each step (reference
sequence_generator.py:425-432).  Built on the same TransformerDecoder stack
(cross-attention unused) with scaled embedding + fairseq sinusoidal positions.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig, RelPosConfig
from ..ops.positional import fairseq_sinusoidal_table
from .decoder import TransformerDecoder


@dataclass(frozen=True)
class TransformerLMConfig:
    vocab_size: int = 81
    pad_id: int = 1
    max_positions: int = 1024
    scale_embedding: bool = True
    share_embed: bool = True  # tie input/output embeddings
    trunk: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(
            d_model=1280, ffn_dim=6144, num_layers=20, num_heads=16,
            layer_norm_first=True, rel_pos=RelPosConfig(enabled=False),
            use_rel_pos_bias=False,
        )
    )


def lm_tiny() -> TransformerLMConfig:
    return TransformerLMConfig(
        vocab_size=32,
        max_positions=64,
        trunk=TransformerConfig(
            d_model=64, ffn_dim=128, num_layers=2, num_heads=4,
            layer_norm_first=True, rel_pos=RelPosConfig(enabled=False),
            use_rel_pos_bias=False, dropout=0.0, attention_dropout=0.0,
        ),
    )


class TransformerLM(nn.Module):
    cfg: TransformerLMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.trunk.d_model, param_dtype=jnp.float32,
            name="embed_tokens",
        )
        self.decoder = TransformerDecoder(cfg.trunk, dtype=self.dtype)
        if not cfg.share_embed:
            self.output_projection = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=jnp.float32,
                name="output_projection",
            )

    def _embed(self, tokens, positions):
        cfg = self.cfg
        scale = math.sqrt(cfg.trunk.d_model) if cfg.scale_embedding else 1.0
        x = self.embed_tokens(tokens).astype(self.dtype) * scale
        table = jnp.asarray(
            fairseq_sinusoidal_table(
                cfg.pad_id + 2 + cfg.max_positions, cfg.trunk.d_model, cfg.pad_id
            )
        )
        return x + table[positions].astype(self.dtype)

    def _logits(self, feats):
        if self.cfg.share_embed:
            return feats.astype(jnp.float32) @ self.embed_tokens.embedding.T.astype(
                jnp.float32
            )
        return self.output_projection(feats.astype(jnp.float32))

    def __call__(self, tokens, deterministic: bool = True):
        """Full forward: [B, T] -> logits [B, T, V]."""
        cfg = self.cfg
        valid = tokens != cfg.pad_id
        pos = cfg.pad_id + jnp.cumsum(valid.astype(jnp.int32), axis=-1) * valid
        x = self._embed(tokens, pos)
        feats, _ = self.decoder(
            x, None, self_valid=valid, causal=True, deterministic=deterministic
        )
        return self._logits(feats)

    def init_cache(self, batch_size: int, max_len: int):
        cfg = self.cfg.trunk
        zeros = jnp.zeros(
            (batch_size, max_len, cfg.num_heads, cfg.head_dim), self.dtype
        )
        layers = [{"k": zeros, "v": zeros} for _ in range(cfg.num_layers)]
        # no cross attention: dummy None entries kept out of the pytree
        return {"index": jnp.zeros((), jnp.int32), "layers": layers}

    def decode_step(self, tokens_t, cache):
        """tokens_t: [B, 1] -> (logits [B, V], cache)."""
        cfg = self.cfg
        pos = cfg.pad_id + 1 + cache["index"]
        x = self._embed(tokens_t, jnp.full_like(tokens_t, 0) + pos)
        idx = cache["index"]
        new_layers = []
        for i, layer in enumerate(self.decoder.layers):
            x, _, new_self = layer(
                x, None, causal=True, self_cache=cache["layers"][i],
                cache_index=idx, deterministic=True,
            )
            new_layers.append(new_self)
        if cfg.trunk.layer_norm_first:
            x = self.decoder.layer_norm(x).astype(self.dtype)
        logits = self._logits(x)[:, 0]
        return logits, {"index": idx + 1, "layers": new_layers}
