"""HiFi-GAN vocoder generator as a fused XLA synthesis graph.

The reference defers vocoding to an external pre-trained torch HiFi-GAN
(reference SpeechT5/README.md:250, scripts/generate_speech.py:167 saves mel
.npy for offline synthesis).  Here the generator — conv_pre, transposed-conv
upsampling, multi-receptive-field (MRF) resblock fusion, conv_post — is native
JAX so TTS runs mel->waveform on-TPU in one jit (v1 topology matching the HF
``microsoft/speecht5_hifigan`` checkpoint: 80 mels -> 512 channels, upsample
rates (4,4,4,4) = hop 256, resblock kernels (3,7,11) x dilations (1,3,5)).

All convs use torch weight_norm(dim=0) parametrization (weight_g/weight_v kept
separate) so released checkpoints convert losslessly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclass(frozen=True)
class HiFiGANConfig:
    in_dim: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (4, 4, 4, 4)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 8, 8)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    leaky_slope: float = 0.1
    normalize_before: bool = True  # HF SpeechT5HifiGan mel standardization


def _wn_kernel(module, name, shape, param_dtype):
    """weight_norm(dim=0 torch) params: v same shape as kernel, g per out-chan.
    flax kernel layout [k, in, out] -> norm over (k, in) per out channel."""
    v = module.param(
        f"{name}_v", nn.initializers.normal(stddev=0.05), shape, param_dtype
    )
    g = module.param(
        f"{name}_g",
        lambda key, s: jnp.linalg.norm(
            v.reshape(-1, shape[-1]), axis=0
        ).reshape(s),
        (shape[-1],),
    )
    norm = jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1), keepdims=True) + 1e-12)
    return g[None, None, :] * v / norm


class WNConv1d(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel_size, self.dilation
        pad = (k - 1) * d // 2
        w = _wn_kernel(
            self, "weight", (k, x.shape[-1], self.features), self.param_dtype
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride,), padding=[(pad, pad)],
            rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + b


class WNConvTranspose1d(nn.Module):
    """torch ConvTranspose1d(stride=s, padding=p) semantics:
    out_len = (in_len - 1)*s + k - 2p.  Implemented as input-dilated conv."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        w = _wn_kernel(
            self, "weight", (k, x.shape[-1], self.features), self.param_dtype
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        # transposed conv = lhs-dilate by s, pad (k-1-p), correlate with
        # flipped kernel
        w_fl = jnp.flip(w, axis=0)
        y = jax.lax.conv_general_dilated(
            x, w_fl, window_strides=(1,), padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(s,), dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + b


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    slope: float

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            y = jax.nn.leaky_relu(x, self.slope)
            y = WNConv1d(
                self.channels, self.kernel_size, dilation=d, name=f"convs1_{i}"
            )(y)
            y = jax.nn.leaky_relu(y, self.slope)
            y = WNConv1d(
                self.channels, self.kernel_size, dilation=1, name=f"convs2_{i}"
            )(y)
            x = x + y
        return x


class HiFiGANGenerator(nn.Module):
    cfg: HiFiGANConfig = HiFiGANConfig()

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, 80] log-mel -> waveform [B, T*prod(upsample_rates)]."""
        cfg = self.cfg
        if cfg.normalize_before:
            mean = self.param("mel_mean", nn.initializers.zeros, (cfg.in_dim,))
            scale = self.param("mel_scale", nn.initializers.ones, (cfg.in_dim,))
            mel = (mel - mean) / jnp.maximum(scale, 1e-8)

        x = WNConv1d(cfg.upsample_initial_channel, 7, name="conv_pre")(mel)
        ch = cfg.upsample_initial_channel
        for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            x = jax.nn.leaky_relu(x, cfg.leaky_slope)
            ch //= 2
            x = WNConvTranspose1d(
                ch, k, stride=r, padding=(k - r) // 2, name=f"ups_{i}"
            )(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)
            ):
                y = ResBlock1(
                    ch, rk, rd, cfg.leaky_slope,
                    name=f"resblocks_{i * len(cfg.resblock_kernel_sizes) + j}",
                )(x)
                acc = y if acc is None else acc + y
            x = acc / len(cfg.resblock_kernel_sizes)
        x = jax.nn.leaky_relu(x, cfg.leaky_slope)
        x = WNConv1d(1, 7, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


@dataclass(frozen=True)
class CodeHiFiGANConfig:
    """Unit-conditioned vocoder (the S2ST chain's code-HiFi-GAN: discrete
    unit embedding -> generator; reference Speech2S decodes units with
    fairseq speech-resynthesis CodeHiFiGAN,
    stpretrain_scripts/decode_text2code_beam2.sh + eval2.sh)."""

    num_units: int = 1000
    embed_dim: int = 128
    dur_predictor: bool = False   # reduced (deduped) units need re-expansion
    max_duration: int = 8         # static cap so expansion stays jittable
    generator: HiFiGANConfig = HiFiGANConfig(
        in_dim=128, normalize_before=False
    )


class CodeHiFiGAN(nn.Module):
    """units [B, T] int32 -> waveform [B, T * hop] (hop = prod(upsample)).

    With ``dur_predictor`` the reduced unit stream is first re-expanded:
    a small conv stack predicts a per-unit duration, and embeddings are
    repeated via a cumsum gather with a STATIC output length
    (T * max_duration) — dynamic repeat_interleave would break jit.
    ``unit_valid`` masks padding units (excluded from expansion).
    """

    cfg: CodeHiFiGANConfig = CodeHiFiGANConfig()

    @nn.compact
    def __call__(self, units, unit_valid=None, *, predict_duration=None):
        cfg = self.cfg
        if predict_duration is None:
            predict_duration = cfg.dur_predictor
        x = nn.Embed(cfg.num_units, cfg.embed_dim, name="unit_embed")(units)
        if unit_valid is None:
            unit_valid = jnp.ones(units.shape, bool)
        if predict_duration:
            h = WNConv1d(cfg.embed_dim, 3, name="dur_conv1")(x)
            h = jax.nn.relu(h)
            h = WNConv1d(cfg.embed_dim, 3, name="dur_conv2")(h)
            dur_f = nn.Dense(1, name="dur_proj")(h)[..., 0]
            dur = jnp.clip(
                jnp.round(jnp.exp(dur_f)).astype(jnp.int32),
                1, cfg.max_duration,
            )
            dur = jnp.where(unit_valid, dur, 0)
            # expansion: output slot j takes unit t where
            # cumsum(dur)[t-1] <= j < cumsum(dur)[t]
            ends = jnp.cumsum(dur, axis=1)                  # [B, T]
            T_out = units.shape[1] * cfg.max_duration
            pos = jnp.arange(T_out)[None, :]                # [1, T_out]
            idx = (pos[:, :, None] >= ends[:, None, :]).sum(-1)  # [B, T_out]
            idx = jnp.minimum(idx, units.shape[1] - 1)
            x = jnp.take_along_axis(x, idx[:, :, None], axis=1)
            out_valid = pos < ends[:, -1:]
            x = x * out_valid[:, :, None]
        else:
            x = x * unit_valid[:, :, None]
        return HiFiGANGenerator(cfg.generator, name="generator")(x)
