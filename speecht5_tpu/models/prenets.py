"""Modality prenets: speech/text x encoder/decoder.

Behavioral specs:
- SpeechEncoderPrenet: reference modules/speech_encoder_prenet.py:58-272 —
  wav2vec2 conv feature extractor, post-LN + 512->d proj, HuBERT masking,
  weight-normed conv positional embedding + fairseq sinusoidal positions.
- TextEncoderPrenet: reference modules/text_encoder_prenet.py — embedding +
  espnet ScaledPositionalEncoding.
- TextDecoderPrenet: reference modules/text_decoder_prenet.py — embedding
  (unscaled, no_scale_embedding=True) + fairseq sinusoidal positions.
- SpeechDecoderPrenet: reference modules/speech_decoder_prenet.py:21-110 —
  Tacotron2 prenet (dropout active at eval too), linear to d_model, espnet
  ScaledPositionalEncoding, speaker x-vector concat+ReLU ('pre' integration).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SpeechT5Config, ConvFeatureConfig
from ..ops.positional import fairseq_sinusoidal, espnet_sinusoidal
from ..ops.masking import apply_feature_masks
from ..utils.masks import length_mask


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_multiply(x, scale: float):
    """Identity forward, cotangent scaled by ``scale`` in the backward pass
    (reference fairseq GradMultiply, used at speech_encoder_prenet.py:156-164).

    Implemented as a custom VJP instead of the
    ``x*g + stop_grad(x)*(1-g)`` identity: that formulation materializes two
    extra copies of the conv feature map ([B, ~T/5, 512] at raw-waveform
    length — ~0.5 GB at batch 16x10s), which profiled as one of the largest
    HBM costs of the base-ASR train step."""
    return x


def _grad_multiply_fwd(x, scale):
    return x, None


def _grad_multiply_bwd(scale, _res, g):
    return (g * scale,)


grad_multiply.defvjp(_grad_multiply_fwd, _grad_multiply_bwd)


class WeightNormConv1d(nn.Module):
    """Conv1d with torch weight_norm(dim=2) parametrization (per-kernel-position
    magnitude), matching the reference conv positional embedding
    (speech_encoder_prenet.py:107-119) for checkpoint parity."""

    features: int
    kernel_size: int
    groups: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, T, C]; kernel layout: [k, in/groups, out]
        in_ch = x.shape[-1]
        k = self.kernel_size
        v = self.param(
            "weight_v",
            nn.initializers.normal(stddev=0.02),
            (k, in_ch // self.groups, self.features),
            self.param_dtype,
        )
        g = self.param(
            "weight_g", nn.initializers.ones, (k, 1, 1), self.param_dtype
        )
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(1, 2), keepdims=True) + 1e-12)
        w = (g * v / norm).astype(self.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        # SAME-style padding k//2 both sides, then SamePad trims one trailing
        # element for even kernels (reference SamePad in prenet :119)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w,
            window_strides=(1,),
            padding=[(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
        )
        y = y + b.astype(self.dtype)
        if k % 2 == 0:
            y = y[:, :-1, :]
        return y


class _Conv0MatMul(nn.Module):
    """First w2v2 conv (1 input channel) as an im2col matmul.

    XLA's TPU conv emitter is pathological for 1-channel inputs (measured
    ~34ms for the [B,160k,1]->[B,32k,512] layer alone — the entire conv-FE
    cost); framing via shifted strided views + one [*, k] @ [k, C] matmul
    runs it on the MXU.  Param name/shape/init identical to nn.Conv, so
    checkpoints and the converter are unaffected.  Requires stride | kernel.
    """

    features: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, 1, self.features), self.param_dtype,
        )
        B, T, _ = x.shape
        n_out = (T - k) // s + 1
        rows = x[:, : (T // s) * s, 0].reshape(B, T // s, s)
        parts = [rows[:, i : i + n_out] for i in range(k // s)]
        frames = jnp.concatenate(parts, axis=-1).astype(self.dtype)
        return frames @ kernel[:, 0, :].astype(self.dtype)


class _PolyphaseConv(nn.Module):
    """Strided Conv1d as a sum of per-tap strided-slice matmuls.

    y[t] = sum_j x[s*t + j] @ W[j] — each tap is one [B*n_out, C_in] x
    [C_in, C_out] GEMM over a strided slice, so the whole layer runs as k
    well-shaped MXU matmuls instead of XLA:TPU's conv emitter (measured
    ~26% of bf16 peak for the w2v2 middle layers).  Param names/shapes are
    identical to nn.Conv ("kernel" [k, C_in, C_out], optional "bias"), so
    checkpoints and converters are unaffected.  Numerics match conv up to
    f32-accumulator reassociation (one extra add per tap).
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        B, T, C_in = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, C_in, self.features), self.param_dtype,
        )
        n_out = (T - k) // s + 1
        y = None
        for j in range(k):
            xj = jax.lax.slice_in_dim(
                x, j, j + s * (n_out - 1) + 1, stride=s, axis=1
            ).astype(self.dtype)
            yj = xj @ kernel[j].astype(self.dtype)
            y = yj if y is None else y + yj
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        return y


class _PerChannelGroupNorm(nn.Module):
    """GroupNorm with num_groups == channels (per-channel stats over time),
    the w2v2 "default" mode's Fp32GroupNorm on conv layer 0.

    Equivalent to nn.GroupNorm(num_groups=C) but keeps the feature map in the
    compute dtype: only the mean/var reductions run in f32 (tiny [B, C]
    outputs).  nn.GroupNorm(dtype=f32) materializes f32 copies of the
    [B, ~T/5, 512] conv-0 activation (~2 GB at batch 16x10s), which profiled
    as a top cost of the base train step.  Param names/shapes match
    nn.GroupNorm ("scale"/"bias", [C]) so checkpoints and converters are
    unaffected."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=1, keepdims=True)                      # [B, 1, C]
        var = jnp.square(xf).mean(axis=1, keepdims=True) - mean**2
        inv = jax.lax.rsqrt(var + self.epsilon) * scale[None, None, :]
        shift = bias[None, None, :] - mean * inv
        return (x * inv.astype(self.dtype) + shift.astype(self.dtype)).astype(
            self.dtype
        )


class _ConvKernelParam(nn.Module):
    """Bare conv kernel param under the same {conv_i: {kernel}} tree as the
    nn.Conv path, so checkpoints interchange across conv_features.impl."""

    shape: tuple
    param_dtype: Any

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(in_axis=(0, 1),
                                                   out_axis=2),
            self.shape, self.param_dtype,
        )


class ConvFeatureExtractor(nn.Module):
    """wav2vec2-style stack of strided Conv1d blocks
    (reference speech_encoder_prenet.py:278-374)."""

    cfg: ConvFeatureConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        """wav: [B, T] -> [B, frames, C_out]."""
        x = wav[..., None].astype(self.dtype)  # NWC
        use_pallas = (
            self.cfg.impl == "pallas" and self.cfg.mode == "default"
            and not self.cfg.bias and len(self.cfg.layers) > 1
        )
        for i, (dim, k, stride) in enumerate(self.cfg.layers):
            if use_pallas and i == 1:
                # layers 1.. fused into ONE Pallas program: per-tap matmuls
                # over strided reshape views (no im2col materialization),
                # GELU between layers on-chip, intermediates never touch HBM
                # (ops/pallas_kernels.conv_stack_fused; bwd = XLA recompute).
                # Param tree identical to the nn.Conv path.
                from ..ops.pallas_kernels import conv_stack_fused

                rest = self.cfg.layers[1:]
                weights = []
                c_in = x.shape[-1]
                for li, (d2, k2, s2) in enumerate(rest, start=1):
                    weights.append(_ConvKernelParam(
                        (k2, c_in, d2), self.param_dtype,
                        name=f"conv_{li}",
                    )())
                    c_in = d2
                x = conv_stack_fused(
                    x, tuple(weights),
                    tuple((k2, s2) for _, k2, s2 in rest),
                )
                break
            if i == 0 and k % stride == 0 and not self.cfg.bias:
                x = _Conv0MatMul(
                    dim, k, stride, self.dtype, self.param_dtype,
                    name="conv_0",
                )(x)
            elif self.cfg.impl == "polyphase":
                # per-tap strided-slice matmuls (no [B, T, k*C] im2col blowup;
                # an im2col variant was measured SLOWER at 5.5 vs 6.8 steps/s)
                x = _PolyphaseConv(
                    dim, k, stride, self.cfg.bias,
                    self.dtype, self.param_dtype, name=f"conv_{i}",
                )(x)
            else:
                x = nn.Conv(
                    features=dim,
                    kernel_size=(k,),
                    strides=(stride,),
                    padding="VALID",
                    use_bias=self.cfg.bias,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"conv_{i}",
                )(x)
            if self.cfg.mode == "layer_norm":
                x = nn.LayerNorm(dtype=jnp.float32, name=f"ln_{i}")(x).astype(self.dtype)
            elif self.cfg.mode == "default" and i == 0:
                x = _PerChannelGroupNorm(
                    epsilon=1e-5, dtype=self.dtype, name="group_norm"
                )(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class SpeechEncoderPrenet(nn.Module):
    cfg: SpeechT5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.feature_extractor = ConvFeatureExtractor(
            cfg.conv_features, self.dtype, self.param_dtype, name="feature_extractor"
        )
        self.layer_norm = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")
        if cfg.conv_features.out_dim != cfg.d_model:
            self.post_extract_proj = nn.Dense(
                cfg.d_model, dtype=self.dtype, param_dtype=self.param_dtype,
                name="post_extract_proj",
            )
        self.mask_emb = self.param(
            "mask_emb",
            nn.initializers.uniform(scale=1.0),
            (cfg.d_model,),
            jnp.float32,
        )
        if cfg.use_conv_pos:
            self.pos_conv = WeightNormConv1d(
                cfg.d_model, cfg.conv_pos, cfg.conv_pos_groups,
                self.dtype, self.param_dtype, name="pos_conv",
            )
        self.drop = nn.Dropout(cfg.encoder.dropout)

    def __call__(
        self,
        wav,
        wav_lengths,
        *,
        mask: bool = False,
        deterministic: bool = True,
    ):
        """wav: [B, T] raw 16 kHz; returns (x [B, frames, D], valid[B, frames],
        time_mask or None, features_pen)."""
        cfg = self.cfg
        feats = self.feature_extractor(wav)
        # feature grad scaling (reference :156-164) — structural grad control
        if cfg.feature_grad_mult == 0.0:
            feats = jax.lax.stop_gradient(feats)
        elif cfg.feature_grad_mult != 1.0:
            feats = grad_multiply(feats, cfg.feature_grad_mult)

        features_pen = jnp.mean(feats.astype(jnp.float32) ** 2)

        frames = feats.shape[1]
        frame_lengths = cfg.conv_features.out_length(wav_lengths)
        valid = length_mask(frame_lengths, frames)

        x = self.layer_norm(feats).astype(self.dtype)
        if hasattr(self, "post_extract_proj"):
            x = self.post_extract_proj(x)
        x = self.drop(x, deterministic=deterministic)

        time_mask = None
        if mask and cfg.masking.mask_prob > 0:
            x, time_mask = apply_feature_masks(
                self.make_rng("mask"),
                x,
                frame_lengths,
                self.mask_emb,
                mask_prob=cfg.masking.mask_prob,
                mask_length=cfg.masking.mask_length,
                mask_channel_prob=cfg.masking.mask_channel_prob,
                mask_channel_length=cfg.masking.mask_channel_length,
                min_masks=cfg.masking.min_masks,
            )

        if cfg.use_conv_pos:
            pos = self.pos_conv(x)
            pos = jax.nn.gelu(pos, approximate=False)
            x = x + pos
        if cfg.use_sinc_pos:
            x = x + fairseq_sinusoidal(valid, cfg.d_model).astype(self.dtype)

        return x, valid, time_mask, features_pen


class TextEncoderPrenet(nn.Module):
    """Embedding + espnet ScaledPositionalEncoding (alpha * pe)."""

    cfg: SpeechT5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.d_model, param_dtype=self.param_dtype,
            name="embed_tokens",
        )
        self.alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
        self.drop = nn.Dropout(cfg.encoder.dropout)

    def __call__(self, tokens, deterministic: bool = True):
        cfg = self.cfg
        x = self.embed_tokens(tokens).astype(self.dtype)
        pe = espnet_sinusoidal(tokens.shape[1], cfg.d_model).astype(self.dtype)
        x = x + self.alpha.astype(self.dtype) * pe[None]
        x = self.drop(x, deterministic=deterministic)
        valid = tokens != cfg.pad_id
        return x, valid


class TextDecoderPrenet(nn.Module):
    """Embedding (unscaled) + fairseq sinusoidal positions + dropout."""

    cfg: SpeechT5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.d_model, param_dtype=self.param_dtype,
            name="embed_tokens",
        )
        self.drop = nn.Dropout(cfg.decoder.dropout)

    def __call__(self, tokens, deterministic: bool = True):
        """Full-sequence mode.  tokens: [B, T]."""
        cfg = self.cfg
        valid = tokens != cfg.pad_id
        x = self.embed_tokens(tokens).astype(self.dtype)
        x = x + fairseq_sinusoidal(valid, cfg.d_model, cfg.pad_id).astype(self.dtype)
        x = self.drop(x, deterministic=deterministic)
        # reference text_decoder_prenet.py:92-96: mask only returned if any pad
        return x, valid

    def step(self, tokens_t, position, deterministic: bool = True):
        """Incremental mode.  tokens_t: [B, 1] current token; position: scalar step
        (0-based).  fairseq positions = pad_id + 1 + position for live beams."""
        cfg = self.cfg
        from ..ops.positional import fairseq_sinusoidal_table

        x = self.embed_tokens(tokens_t).astype(self.dtype)
        table = jnp.asarray(
            fairseq_sinusoidal_table(
                cfg.pad_id + 2 + cfg.max_text_positions, cfg.d_model, cfg.pad_id
            )
        )
        pos_emb = table[cfg.pad_id + 1 + position]
        x = x + pos_emb[None, None, :].astype(self.dtype)
        return self.drop(x, deterministic=deterministic)


class TacotronPrenet(nn.Module):
    """Tacotron2 decoder prenet: Dense->ReLU->Dropout blocks with dropout applied
    in both train and eval (espnet convention; the always-on dropout is the
    information bottleneck that makes AR mel decoding robust)."""

    layers: int
    units: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rng=None):
        for i in range(self.layers):
            x = nn.Dense(
                self.units, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(x)
            x = jax.nn.relu(x)
            if rng is not None:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - self.dropout, x.shape)
                x = jnp.where(keep, x / (1.0 - self.dropout), 0.0)
        return x


class SpeechDecoderPrenet(nn.Module):
    cfg: SpeechT5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.prenet = TacotronPrenet(
            cfg.speech_prenet.layers, cfg.speech_prenet.units,
            cfg.speech_prenet.dropout, self.dtype, self.param_dtype, name="prenet",
        )
        self.proj = nn.Dense(
            cfg.d_model, dtype=self.dtype, param_dtype=self.param_dtype, name="proj"
        )
        self.alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
        self.drop = nn.Dropout(cfg.decoder.dropout)
        if cfg.spk_embed_dim is not None and cfg.spk_embed_integration == "pre":
            self.spkembs_layer = nn.Dense(
                cfg.d_model, dtype=self.dtype, param_dtype=self.param_dtype,
                name="spkembs_layer",
            )

    def __call__(
        self,
        prev_mel,                 # [B, T, n_mels] r-thinned previous frames
        tgt_lengths=None,
        spkembs=None,             # [B, spk_embed_dim]
        *,
        position_offset: int = 0,  # for incremental decode
        deterministic: bool = True,
    ):
        cfg = self.cfg
        rng = self.make_rng("prenet") if self.has_rng("prenet") else None
        x = self.prenet(prev_mel.astype(self.dtype), rng)
        x = self.proj(x)
        T = x.shape[1]
        # static table + dynamic slice: position_offset is traced inside the
        # jitted AR decode loop
        from ..ops.positional import espnet_sinusoidal_table

        table = jnp.asarray(
            espnet_sinusoidal_table(cfg.max_speech_positions + 8, cfg.d_model)
        )
        pe = jax.lax.dynamic_slice_in_dim(
            table, position_offset, T, axis=0
        ).astype(self.dtype)
        x = x + self.alpha.astype(self.dtype) * pe[None]
        x = self.drop(x, deterministic=deterministic)

        if spkembs is not None and cfg.spk_embed_integration == "pre":
            s = spkembs / jnp.maximum(
                jnp.linalg.norm(spkembs, axis=-1, keepdims=True), 1e-12
            )
            s = jnp.broadcast_to(s[:, None, :], (x.shape[0], T, s.shape[-1]))
            x = jax.nn.relu(
                self.spkembs_layer(jnp.concatenate([x, s.astype(self.dtype)], axis=-1))
            )

        valid = None
        if tgt_lengths is not None:
            valid = length_mask(tgt_lengths, T)
        return x, valid
