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
