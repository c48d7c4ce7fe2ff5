"""Transformer encoder/decoder layers.

Behavioral spec from reference modules/transformer_layer.py:23-411:
- encoder layer: BERT-style, pre-LN or post-LN; rel-pos bias table passed through,
  LayerNormed per layer (``norm_k``) only on the pre-LN path (:72-73, 90-93);
- decoder layer: self-attn (causal) + cross-attn + FFN; pre/post-LN variants.
  NOTE the reference builds decoder self-attention without rel-pos bias
  (transformer_layer.py:229-242 never passes has_relative_attention_bias), so the
  decoder's pos table is inert — mirrored here by cfg.use_rel_pos_bias=False.
- activation GELU (exact erf, torch parity — jax.nn.gelu approximate=False).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig
from .attention import MultiheadAttention


def activation_fn(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(name)


class FeedForward(nn.Module):
    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.fc1 = nn.Dense(
            self.cfg.ffn_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1"
        )
        self.fc2 = nn.Dense(
            self.cfg.d_model, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2"
        )
        self.drop = nn.Dropout(self.cfg.activation_dropout)

    def __call__(self, x, deterministic=True):
        x = self.fc1(x)
        x = activation_fn(self.cfg.activation)(x)
        x = self.drop(x, deterministic=deterministic)
        return self.fc2(x)


def _ln(cfg: TransformerConfig, name: str):
    # LayerNorm computed in f32 for stability regardless of compute dtype.
    return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name=name)


class EncoderLayer(nn.Module):
    """reference transformer_layer.py:23-134 (TransformerSentenceEncoderLayer)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.self_attn = MultiheadAttention(
            cfg.d_model, cfg.num_heads, cfg.attention_dropout,
            dtype=self.dtype, param_dtype=self.param_dtype,
            use_pallas=cfg.use_pallas_attn,
            use_pallas_train=cfg.use_pallas_attn_train,
            scores_f32=cfg.attn_scores_f32, name="self_attn",
        )
        self.self_attn_layer_norm = _ln(cfg, "self_attn_layer_norm")
        self.final_layer_norm = _ln(cfg, "final_layer_norm")
        self.ffn = FeedForward(cfg, self.dtype, self.param_dtype, name="ffn")
        self.drop = nn.Dropout(cfg.dropout)
        if cfg.rel_pos.enabled and cfg.use_rel_pos_bias:
            # checkpoint parity: per-head-dim LN of the pos table (applied pre-LN only)
            self.norm_k = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="norm_k"
            )

    def __call__(
        self,
        x,
        key_valid=None,
        pos_table=None,
        pos_band=None,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        # args positional-or-keyword so nn.remat(static_argnums=(5, 6))
        # can mark deterministic/return_weights static
        cfg = self.cfg
        residual = x
        if cfg.layer_norm_first:
            x = self.self_attn_layer_norm(x).astype(self.dtype)
            if pos_table is not None:
                pos_table = self.norm_k(pos_table).astype(self.dtype)
            y, w, _ = self.self_attn(
                x, key_valid=key_valid, pos_table=pos_table,
                max_dist=cfg.rel_pos.max_distance,
                deterministic=deterministic, return_weights=return_weights,
            )
            x = residual + self.drop(y, deterministic=deterministic)
            residual = x
            x = self.final_layer_norm(x).astype(self.dtype)
            x = self.ffn(x, deterministic)
            x = residual + self.drop(x, deterministic=deterministic)
        else:
            # post-LN: norm_k exists in checkpoints but is NOT applied
            # (reference transformer_layer.py:112-119 passes pos_bias raw),
            # so the precomputed band is shareable across layers.
            y, w, _ = self.self_attn(
                x, key_valid=key_valid, pos_table=pos_table,
                pos_band=pos_band,
                max_dist=cfg.rel_pos.max_distance,
                deterministic=deterministic, return_weights=return_weights,
            )
            x = residual + self.drop(y, deterministic=deterministic)
            x = self.self_attn_layer_norm(x).astype(self.dtype)
            residual = x
            x = self.ffn(x, deterministic)
            x = residual + self.drop(x, deterministic=deterministic)
            x = self.final_layer_norm(x).astype(self.dtype)
        return x, w


class DecoderLayer(nn.Module):
    """reference transformer_layer.py:137-404 (TransformerDecoderLayer)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.self_attn = MultiheadAttention(
            cfg.d_model, cfg.num_heads, cfg.attention_dropout,
            dtype=self.dtype, param_dtype=self.param_dtype,
            scores_f32=cfg.attn_scores_f32, name="self_attn",
        )
        self.encoder_attn = MultiheadAttention(
            cfg.d_model, cfg.num_heads, cfg.attention_dropout,
            dtype=self.dtype, param_dtype=self.param_dtype,
            scores_f32=cfg.attn_scores_f32, name="encoder_attn",
        )
        self.self_attn_layer_norm = _ln(cfg, "self_attn_layer_norm")
        self.encoder_attn_layer_norm = _ln(cfg, "encoder_attn_layer_norm")
        self.final_layer_norm = _ln(cfg, "final_layer_norm")
        self.ffn = FeedForward(cfg, self.dtype, self.param_dtype, name="ffn")
        self.drop = nn.Dropout(cfg.dropout)
        if cfg.rel_pos.enabled and cfg.use_rel_pos_bias:
            self.norm_k = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="norm_k"
            )

    def __call__(
        self,
        x,
        enc=None,                  # [B, Tsrc, D] encoder output (full fwd)
        enc_valid=None,            # bool [B, Tsrc]
        self_valid=None,           # bool [B, Ttgt]
        causal: bool = True,
        pos_table=None,
        self_cache: Optional[dict] = None,
        cross_kv: Optional[dict] = None,
        cache_index=None,
        deterministic: bool = True,
        need_cross_weights: bool = False,
        cache_rows=None,           # ancestry map for gather-free beam reorder
    ):
        # positional-or-keyword so nn.remat(static_argnums=(5, 10, 11)) can
        # mark causal/deterministic/need_cross_weights static
        # (cache_rows is keyword-only in practice: decode paths never remat)
        cfg = self.cfg
        use_pos = cfg.use_rel_pos_bias and pos_table is not None

        # --- self attention ---
        residual = x
        if cfg.layer_norm_first:
            x = self.self_attn_layer_norm(x).astype(self.dtype)
            if use_pos:
                pos_table = self.norm_k(pos_table).astype(self.dtype)
        y, _, new_self_cache = self.self_attn(
            x,
            key_valid=self_valid,
            causal=causal,
            pos_table=pos_table if use_pos else None,
            max_dist=cfg.rel_pos.max_distance,
            cache=self_cache,
            cache_index=cache_index,
            cache_rows=cache_rows,
            deterministic=deterministic,
        )
        x = residual + self.drop(y, deterministic=deterministic)
        if not cfg.layer_norm_first:
            x = self.self_attn_layer_norm(x).astype(self.dtype)

        # --- cross attention ---
        cross_w = None
        if enc is not None or cross_kv is not None:
            residual = x
            if cfg.layer_norm_first:
                x = self.encoder_attn_layer_norm(x).astype(self.dtype)
            y, cross_w, _ = self.encoder_attn(
                x,
                enc,
                key_valid=enc_valid,
                cross_kv=cross_kv,
                deterministic=deterministic,
                return_weights=need_cross_weights,
            )
            x = residual + self.drop(y, deterministic=deterministic)
            if not cfg.layer_norm_first:
                x = self.encoder_attn_layer_norm(x).astype(self.dtype)

        # --- ffn ---
        residual = x
        if cfg.layer_norm_first:
            x = self.final_layer_norm(x).astype(self.dtype)
        x_f = self.ffn(x, deterministic)
        x = residual + self.drop(x_f, deterministic=deterministic)
        if not cfg.layer_norm_first:
            x = self.final_layer_norm(x).astype(self.dtype)

        return x, cross_w, new_self_cache

    def init_cross_kv(self, enc):
        return self.encoder_attn.precompute_kv(enc)
