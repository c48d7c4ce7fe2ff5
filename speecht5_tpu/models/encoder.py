"""Shared transformer encoder stack.

Behavioral spec from reference modules/encoder.py:61-380 (TransformerEncoder):
- a single clipped-distance relative position table shared by all layers
  (``pos_emb``: Embedding(2*max_dist, head_dim), encoder.py:40-59);
- post-LN stacks apply the top-level LayerNorm to the *input* (encoder.py:226-227),
  pre-LN stacks apply it to the output (:275-276);
- optional CTC projection head over the (dropped-out) encoder output
  (encoder.py:101-111, 174-179);
- ``unb_enc_layer``: tap layer i's output as the decoder input (encoder.py:96,262-263);
- layerdrop (train only), reimplemented with a keyed PRNG instead of host numpy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig
from .layers import EncoderLayer


class RelPosTable(nn.Module):
    """Embedding table for clipped relative distances (reference encoder.py:40-59)."""

    max_dist: int
    head_dim: int
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe_k = nn.Embed(
            2 * self.max_dist, self.head_dim, param_dtype=self.param_dtype, name="pe_k"
        )

    def __call__(self):
        return self.pe_k.embedding


class TransformerEncoder(nn.Module):
    cfg: TransformerConfig
    ctc_vocab_size: Optional[int] = None
    unb_enc_layer: int = -1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        # nn.remat preserves the param scope, so checkpoints stay compatible
        layer_cls = (
            nn.remat(EncoderLayer, static_argnums=(5, 6))
            if cfg.remat else EncoderLayer
        )
        self.layers = [
            layer_cls(cfg, self.dtype, self.param_dtype, name=f"layers_{i}")
            for i in range(cfg.num_layers)
        ]
        self.layer_norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm"
        )
        self.drop = nn.Dropout(cfg.dropout)
        if cfg.rel_pos.enabled:
            self.pos_emb = RelPosTable(
                cfg.rel_pos.max_distance, cfg.head_dim, self.param_dtype, name="pos_emb"
            )
        if self.ctc_vocab_size is not None:
            self.proj = nn.Dense(
                self.ctc_vocab_size, dtype=jnp.float32,
                param_dtype=self.param_dtype, name="proj",
            )

    def __call__(
        self,
        x,
        valid_mask=None,
        *,
        deterministic: bool = True,
        with_ctc: bool = False,
    ):
        """x: [B, T, D]; valid_mask: bool [B, T] True=valid.

        Returns dict(encoder_out, valid_mask, decoder_input, ctc_logits).
        """
        cfg = self.cfg

        if not cfg.layer_norm_first:
            x = self.layer_norm(x).astype(self.dtype)
        x = self.drop(x, deterministic=deterministic)

        pos_table = self.pos_emb() if cfg.rel_pos.enabled else None
        pos_band = None
        if pos_table is not None and not cfg.layer_norm_first and x.shape[1] > 1:
            # post-LN: norm_k is never applied (transformer_layer.py:112-119),
            # so the banded table is identical for every layer — skew ONCE
            # and each layer pays only an MXU einsum (measured ~30% faster
            # bias path at base ASR shapes)
            from .attention import band_from_table

            pos_band = band_from_table(
                pos_table.astype(self.dtype), x.shape[1],
                cfg.rel_pos.max_distance,
            )
            pos_table = None

        decoder_input = None
        for i, layer in enumerate(self.layers):
            def run_layer(h, layer=layer):
                out, _ = layer(h, valid_mask, pos_table, pos_band,
                               deterministic, False)
                return out

            if (not deterministic) and cfg.layerdrop > 0.0 and i != self.unb_enc_layer:
                keep = jax.random.bernoulli(
                    self.make_rng("layerdrop"), 1.0 - cfg.layerdrop
                )
                # run the layer unconditionally and select the output: a
                # lax.cond here costs far more than the ~5% wasted layer
                # compute — profiled at base-ASR training shapes, the 12
                # fwd+bwd conditionals serialized the program and took 2/3 of
                # the step (176ms -> 65ms/step after this change); grads of a
                # dropped layer are structurally zero either way
                x = jnp.where(keep, run_layer(x), x)
            else:
                x = run_layer(x)
            if i == self.unb_enc_layer:
                decoder_input = x

        if cfg.layer_norm_first:
            x = self.layer_norm(x).astype(self.dtype)

        out = {
            "encoder_out": x,
            "valid_mask": valid_mask,
            "decoder_input": decoder_input,
        }
        if with_ctc and self.ctc_vocab_size is not None:
            # CTC head over dropped-out encoder output (reference encoder.py:174-179)
            out["ctc_logits"] = self.proj(
                self.drop(x, deterministic=deterministic).astype(jnp.float32)
            )
        return out

    def ctc_head(self, encoder_out):
        return self.proj(encoder_out.astype(jnp.float32))
