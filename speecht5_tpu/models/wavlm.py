"""WavLM speech encoder — true checkpoint topology (gated bucketed rel-pos).

The WavLLM reference consumes a pretrained WavLM encoder
(reference WavLLM/wavllm/models/wavlm.py, used at speechllm_model.py:183).
This is the faithful JAX implementation of that architecture — wav2vec2 conv
feature extractor + feature projection + weight-normed conv positional
embedding + transformer layers whose self-attention adds a T5-style bucketed
relative-position bias, GRU-gated per query position (the WavLM signature
mechanism) — matching the released microsoft/wavlm-base(-plus)/large
checkpoints numerically (tests/test_wavllm_hf.py) so they can be converted
and loaded (utils/convert_components.py).

Base checkpoints are post-LN ("group" feat-norm), Large is pre-LN
("stable layer norm", per-conv-layer LN, conv bias).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import ConvFeatureConfig
from ..utils.masks import length_mask
from .prenets import ConvFeatureExtractor, WeightNormConv1d

NEG_INF = -1e9


@dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    conv: ConvFeatureConfig = field(default_factory=ConvFeatureConfig)
    num_buckets: int = 320
    max_bucket_distance: int = 800
    stable_layer_norm: bool = False     # True for Large (pre-LN)
    conv_pos: int = 128
    conv_pos_groups: int = 16
    layer_norm_eps: float = 1e-5
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def wavlm_base(**kw) -> WavLMConfig:
    return dataclasses.replace(WavLMConfig(), **kw)


def wavlm_large(**kw) -> WavLMConfig:
    cfg = WavLMConfig(
        hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=4096,
        conv=ConvFeatureConfig(mode="layer_norm", bias=True),
        stable_layer_norm=True,
    )
    return dataclasses.replace(cfg, **kw)


def wavlm_tiny(**kw) -> WavLMConfig:
    cfg = WavLMConfig(
        hidden_size=32, num_layers=2, num_heads=4, ffn_dim=48,
        conv=ConvFeatureConfig(
            layers=((16, 10, 5), (16, 3, 2), (16, 2, 2))
        ),
        num_buckets=16, max_bucket_distance=40,
        conv_pos=16, conv_pos_groups=4,
        dropout=0.0, attention_dropout=0.0,
    )
    return dataclasses.replace(cfg, **kw)


def relative_position_buckets(T: int, num_buckets: int, max_distance: int):
    """T5-style log-bucketing of relative positions (HF WavLMAttention
    ._relative_positions_bucket semantics), precomputed for a static T."""
    ctx = np.arange(T)[:, None]
    mem = np.arange(T)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    with np.errstate(divide="ignore"):
        large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    large = large / np.log(max_distance / max_exact) * (nb - max_exact)
    large = (max_exact + large).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets = buckets + np.where(is_small, rel, large)
    return jnp.asarray(buckets, jnp.int32)        # [T, T]


class WavLMAttention(nn.Module):
    """Self-attention with the GRU-gated bucketed relative position bias
    (HF modeling_wavlm.WavLMAttention).  Only layer 0 owns the bucket
    embedding; later layers re-gate the layer-0 bias."""

    cfg: WavLMConfig
    has_relative_position_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_valid=None, position_bias=None,
                 deterministic=True):
        cfg = self.cfg
        H = cfg.num_heads
        D = cfg.hidden_size
        Dh = D // H
        B, T, _ = x.shape

        if position_bias is None:
            assert self.has_relative_position_bias
            rel_embed = self.param(
                "rel_attn_embed",
                nn.initializers.normal(stddev=0.02),
                (cfg.num_buckets, H), jnp.float32,
            )
            buckets = relative_position_buckets(
                T, cfg.num_buckets, cfg.max_bucket_distance
            )
            # [T, T, H] -> [H, T, T]
            position_bias = jnp.transpose(rel_embed[buckets], (2, 0, 1))

        # gate: per (b, h, t) scalar from the (pre-projection) hidden state
        gated = x.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        proj = nn.Dense(8, dtype=jnp.float32, name="gru_rel_pos_linear")(
            gated.astype(jnp.float32)
        )
        proj = proj.reshape(B, H, T, 2, 4).sum(-1)
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)
        const = self.param(
            "gru_rel_pos_const", nn.initializers.ones, (1, H, 1, 1), jnp.float32
        )
        gate = gate_a * (gate_b * const - 1.0) + 2.0          # [B, H, T, 1]
        gated_bias = gate * position_bias[None].astype(jnp.float32)

        dense = lambda name: nn.Dense(D, dtype=self.dtype, name=name)
        q = dense("q_proj")(x).reshape(B, T, H, Dh) * (Dh ** -0.5)
        k = dense("k_proj")(x).reshape(B, T, H, Dh)
        v = dense("v_proj")(x).reshape(B, T, H, Dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits + gated_bias
        if key_valid is not None:
            logits = jnp.where(key_valid[:, None, None, :], logits, NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        probs = w.astype(self.dtype)
        if cfg.attention_dropout > 0.0 and not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - cfg.attention_dropout,
                probs.shape,
            )
            probs = probs * keep / (1.0 - cfg.attention_dropout)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(self.dtype))
        o = dense("out_proj")(o.reshape(B, T, D))
        return o, position_bias


class WavLMFeedForward(nn.Module):
    cfg: WavLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        x = nn.Dense(cfg.ffn_dim, dtype=self.dtype,
                     name="intermediate_dense")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(cfg.activation_dropout)(x, deterministic=deterministic)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output_dense")(x)
        return nn.Dropout(cfg.dropout)(x, deterministic=deterministic)


class WavLMEncoderLayer(nn.Module):
    cfg: WavLMConfig
    has_relative_position_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_valid=None, position_bias=None,
                 deterministic=True):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name=name
        )
        attn = WavLMAttention(
            cfg, self.has_relative_position_bias, self.dtype, name="attention"
        )
        if cfg.stable_layer_norm:   # pre-LN (Large)
            residual = x
            h = ln("layer_norm")(x).astype(self.dtype)
            y, position_bias = attn(
                h, key_valid, position_bias, deterministic
            )
            y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
            x = residual + y
            h = ln("final_layer_norm")(x).astype(self.dtype)
            x = x + WavLMFeedForward(cfg, self.dtype, name="feed_forward")(
                h, deterministic
            )
        else:                       # post-LN (Base)
            y, position_bias = attn(
                x, key_valid, position_bias, deterministic
            )
            y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
            x = ln("layer_norm")(x + y).astype(self.dtype)
            x = x + WavLMFeedForward(cfg, self.dtype, name="feed_forward")(
                x, deterministic
            )
            x = ln("final_layer_norm")(x).astype(self.dtype)
        return x, position_bias


class WavLMEncoderModel(nn.Module):
    """waveform -> frame representations [B, T', hidden] (HF WavLMModel)."""

    cfg: WavLMConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.cfg
        dt = self.dtype or cfg.compute_dtype
        self._dt = dt
        self.feature_extractor = ConvFeatureExtractor(
            cfg.conv, dt, jnp.float32, name="feature_extractor"
        )
        self.fp_layer_norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="fp_layer_norm"
        )
        self.fp_projection = nn.Dense(
            cfg.hidden_size, dtype=dt, name="fp_projection"
        )
        self.pos_conv = WeightNormConv1d(
            cfg.hidden_size, cfg.conv_pos, cfg.conv_pos_groups,
            dt, jnp.float32, name="pos_conv",
        )
        self.encoder_layer_norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            name="encoder_layer_norm",
        )
        self.layers = [
            WavLMEncoderLayer(
                cfg, has_relative_position_bias=(i == 0), dtype=dt,
                name=f"layers_{i}",
            )
            for i in range(cfg.num_layers)
        ]
        self.drop = nn.Dropout(cfg.dropout)

    def __call__(self, wav, wav_lengths=None, *, deterministic=True):
        """wav: [B, T] raw 16 kHz -> (features [B, T', hidden], valid [B, T'])."""
        cfg = self.cfg
        feats = self.feature_extractor(wav)
        T = feats.shape[1]
        if wav_lengths is not None:
            frame_lengths = cfg.conv.out_length(wav_lengths)
            valid = length_mask(frame_lengths, T)
        else:
            valid = jnp.ones((wav.shape[0], T), bool)

        x = self.fp_layer_norm(feats).astype(self._dt)
        x = self.fp_projection(x)
        x = self.drop(x, deterministic=deterministic)

        # padded frames are zeroed before the positional conv (HF WavLMEncoder)
        x = jnp.where(valid[:, :, None], x, 0.0)
        pos = self.pos_conv(x)
        pos = jax.nn.gelu(pos, approximate=False)
        x = x + pos
        if not cfg.stable_layer_norm:
            x = self.encoder_layer_norm(x).astype(self._dt)
        x = self.drop(x, deterministic=deterministic)

        position_bias = None
        for layer in self.layers:
            x, position_bias = layer(
                x, valid, position_bias, deterministic
            )
        if cfg.stable_layer_norm:
            x = self.encoder_layer_norm(x).astype(self._dt)
        return x, valid
