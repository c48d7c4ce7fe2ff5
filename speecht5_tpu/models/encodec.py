"""EnCodec neural audio codec (SEANet + residual VQ) as a fused XLA graph.

The reference's codec families stop at RVQ token output and defer the codec
itself to an external torch EnCodec (VALL-E X paper §3; the reference repo
advertises VALL-E X / VioLA as TTS systems, README.md:24-28, but ships no
codec).  Here the full codec is native JAX so token -> waveform (and
waveform -> token prompt encoding) runs on-TPU in one jit:

- decoder: RVQ codebook-sum -> causal SEANet decoder (conv, 2-layer LSTM,
  ConvTranspose upsampling x ratios, residual units) -> waveform;
- encoder: the mirror-image downsampling stack + residual-VQ nearest-
  neighbour encode.

Topology and parametrization match the HF ``facebook/encodec_24khz``
checkpoint family (transformers EncodecModel is the parity oracle in
tests/test_encodec.py); weight_norm is kept as separate g/v params so
released checkpoints convert losslessly (utils/convert_hf.convert_encodec).

TPU-first notes: all convs are stride-1 correlations or lhs-dilated
correlations (MXU-friendly, static shapes); the only sequential op is the
LSTM, a lax.scan over time at small width.  Everything jits with static
shapes — batch decode of B prompts is one program.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclass(frozen=True)
class EncodecConfig:
    audio_channels: int = 1
    num_filters: int = 32
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    upsampling_ratios: Tuple[int, ...] = (8, 5, 4, 2)
    hidden_size: int = 128
    num_lstm_layers: int = 2
    codebook_size: int = 1024
    num_quantizers: int = 32
    compress: int = 2
    sampling_rate: int = 24000

    @property
    def hop_length(self) -> int:
        return int(np_prod(self.upsampling_ratios))

    @property
    def frame_rate(self) -> float:
        return self.sampling_rate / self.hop_length


def np_prod(xs):
    out = 1
    for x in xs:
        out *= x
    return out


def encodec_24khz() -> EncodecConfig:
    """facebook/encodec_24khz geometry (hop 320, 75 Hz, 32 codebooks)."""
    return EncodecConfig()


def encodec_tiny() -> EncodecConfig:
    """CPU-testable shrink of the same topology."""
    return EncodecConfig(
        num_filters=4, hidden_size=8, codebook_size=16, num_quantizers=4,
        upsampling_ratios=(4, 2), num_lstm_layers=1, sampling_rate=16000,
    )


# --------------------------------------------------------------- primitives


def _wn_conv_kernel(module, shape):
    """torch weight_norm(dim=0) on Conv1d (out,in,k): per-OUT-channel g.
    flax layout [k, in, out] -> norm over (k, in)."""
    v = module.param("weight_v", nn.initializers.normal(0.05), shape)
    g = module.param(
        "weight_g",
        lambda key, s: jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1))),
        (shape[-1],),
    )
    norm = jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1), keepdims=True) + 1e-12)
    return g[None, None, :] * v / norm


def _wn_convt_kernel(module, shape):
    """torch weight_norm(dim=0) on ConvTranspose1d (in,out,k): per-IN-channel
    g.  flax layout [k, in, out] -> norm over (k, out)."""
    v = module.param("weight_v", nn.initializers.normal(0.05), shape)
    g = module.param(
        "weight_g",
        lambda key, s: jnp.sqrt(jnp.sum(v ** 2, axis=(0, 2))),
        (shape[1],),
    )
    norm = jnp.sqrt(jnp.sum(v ** 2, axis=(0, 2), keepdims=True) + 1e-12)
    return g[None, :, None] * v / norm


class CausalConv1d(nn.Module):
    """EnCodec causal conv: left reflect-pad by the effective kernel minus
    stride, plus right extra-pad to land on an integer frame count
    (reference-oracle transformers EncodecConv1d)."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        pad_total = k_eff - self.stride
        L = x.shape[1]
        n_frames = (L - k_eff + pad_total) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + k_eff - pad_total
        extra = max(ideal - L, 0)
        # reflect needs pad < length; EnCodec inputs are always longer than
        # one kernel, matching the oracle's small-input zero-extend fallback
        x = jnp.pad(x, ((0, 0), (pad_total, 0), (0, 0)), mode="reflect")
        if extra:
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
        w = _wn_conv_kernel(
            self, (self.kernel_size, x.shape[-1], self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride,), padding=[(0, 0)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + b


class CausalConvTranspose1d(nn.Module):
    """EnCodec causal transposed conv: full fractionally-strided output with
    the right (kernel - stride) samples trimmed (trim_right_ratio=1)."""

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        k, s = self.kernel_size, self.stride
        w = _wn_convt_kernel(self, (k, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        w_fl = jnp.flip(w, axis=0)
        y = jax.lax.conv_general_dilated(
            x, w_fl, window_strides=(1,), padding=[(k - 1, k - 1)],
            lhs_dilation=(s,), dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = y + b
        trim = k - s
        return y[:, : y.shape[1] - trim] if trim else y


class EncodecLSTM(nn.Module):
    """torch nn.LSTM(num_layers) with a residual skip over the whole stack
    (gate order i,f,g,o; oracle transformers EncodecLSTM)."""

    hidden: int
    num_layers: int

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        h_seq = x
        H = self.hidden
        for layer in range(self.num_layers):
            w_ih = self.param(f"weight_ih_l{layer}",
                              nn.initializers.normal(0.05), (4 * H, H))
            w_hh = self.param(f"weight_hh_l{layer}",
                              nn.initializers.normal(0.05), (4 * H, H))
            b_ih = self.param(f"bias_ih_l{layer}",
                              nn.initializers.zeros, (4 * H,))
            b_hh = self.param(f"bias_hh_l{layer}",
                              nn.initializers.zeros, (4 * H,))

            def step(carry, xt, w_ih=w_ih, w_hh=w_hh, b_ih=b_ih, b_hh=b_hh):
                h, c = carry
                z = xt @ w_ih.T + b_ih + h @ w_hh.T + b_hh
                i, f, g, o = jnp.split(z, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            B = x.shape[0]
            init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
            _, out = jax.lax.scan(step, init, jnp.swapaxes(h_seq, 0, 1))
            h_seq = jnp.swapaxes(out, 0, 1)
        return x + h_seq


class SeanetResnetBlock(nn.Module):
    """ELU -> conv(k_res, dilation) -> ELU -> conv(1) with a 1x1-conv
    shortcut (use_conv_shortcut=True, the 24 kHz checkpoint family)."""

    dim: int
    dilation: int
    cfg: EncodecConfig

    @nn.compact
    def __call__(self, x):
        hidden = self.dim // self.cfg.compress
        y = jax.nn.elu(x)
        y = CausalConv1d(hidden, self.cfg.residual_kernel_size,
                         dilation=self.dilation, name="block_conv1")(y)
        y = jax.nn.elu(y)
        y = CausalConv1d(self.dim, 1, name="block_conv2")(y)
        sc = CausalConv1d(self.dim, 1, name="shortcut")(x)
        return sc + y


class SeanetDecoder(nn.Module):
    """hidden_size latents -> waveform (upsampling SEANet stack)."""

    cfg: EncodecConfig

    @nn.compact
    def __call__(self, z):  # [B, T, hidden]
        cfg = self.cfg
        scaling = 2 ** len(cfg.upsampling_ratios)
        x = CausalConv1d(scaling * cfg.num_filters, cfg.kernel_size,
                         name="conv_in")(z)
        x = EncodecLSTM(scaling * cfg.num_filters, cfg.num_lstm_layers,
                        name="lstm")(x)
        for i, ratio in enumerate(cfg.upsampling_ratios):
            cur = scaling * cfg.num_filters
            x = jax.nn.elu(x)
            x = CausalConvTranspose1d(cur // 2, ratio * 2, ratio,
                                      name=f"up{i}")(x)
            for j in range(cfg.num_residual_layers):
                x = SeanetResnetBlock(
                    cur // 2, cfg.dilation_growth_rate ** j, cfg,
                    name=f"res{i}_{j}")(x)
            scaling //= 2
        x = jax.nn.elu(x)
        x = CausalConv1d(cfg.audio_channels, cfg.last_kernel_size,
                         name="conv_out")(x)
        return x


class SeanetEncoder(nn.Module):
    """waveform -> hidden_size latents (downsampling SEANet stack)."""

    cfg: EncodecConfig

    @nn.compact
    def __call__(self, wav):  # [B, T, audio_channels]
        cfg = self.cfg
        scaling = 1
        x = CausalConv1d(cfg.num_filters, cfg.kernel_size, name="conv_in")(wav)
        for i, ratio in enumerate(reversed(cfg.upsampling_ratios)):
            cur = scaling * cfg.num_filters
            for j in range(cfg.num_residual_layers):
                x = SeanetResnetBlock(
                    cur, cfg.dilation_growth_rate ** j, cfg,
                    name=f"res{i}_{j}")(x)
            x = jax.nn.elu(x)
            x = CausalConv1d(cur * 2, ratio * 2, stride=ratio,
                             name=f"down{i}")(x)
            scaling *= 2
        x = EncodecLSTM(scaling * cfg.num_filters, cfg.num_lstm_layers,
                        name="lstm")(x)
        x = jax.nn.elu(x)
        x = CausalConv1d(cfg.hidden_size, cfg.last_kernel_size,
                         name="conv_out")(x)
        return x


class ResidualVQ(nn.Module):
    """Residual vector quantizer (euclidean codebooks, shared shape)."""

    cfg: EncodecConfig

    def setup(self):
        self.embed = self.param(
            "embed", nn.initializers.normal(1.0),
            (self.cfg.num_quantizers, self.cfg.codebook_size,
             self.cfg.hidden_size),
        )

    def decode(self, codes):
        """[B, n_q, T] int32 -> [B, T, hidden] (sum of codebook lookups)."""
        n_q = codes.shape[1]
        quant = jnp.stack(
            [self.embed[q][codes[:, q]] for q in range(n_q)], axis=0
        )  # [n_q, B, T, hidden]
        return quant.sum(0)

    def encode(self, z, n_q: int):
        """[B, T, hidden] -> [B, n_q, T] nearest-neighbour residual encode."""
        residual = z
        out = []
        for q in range(n_q):
            emb = self.embed[q]                                # [K, D]
            d = (jnp.sum(residual ** 2, -1, keepdims=True)
                 - 2.0 * residual @ emb.T
                 + jnp.sum(emb ** 2, -1)[None, None, :])
            idx = jnp.argmin(d, axis=-1)                       # [B, T]
            out.append(idx)
            residual = residual - emb[idx]
        return jnp.stack(out, axis=1).astype(jnp.int32)


class EncodecModel(nn.Module):
    """decode_codes: RVQ tokens -> waveform; encode: waveform -> RVQ tokens.

    ``codes``: [B, n_q, T_frames] int32 (n_q <= num_quantizers selects the
    bandwidth, as the HF model's quantizer slicing does).
    """

    cfg: EncodecConfig

    def setup(self):
        self.quantizer = ResidualVQ(self.cfg)
        self.decoder = SeanetDecoder(self.cfg)
        self.encoder = SeanetEncoder(self.cfg)

    def __call__(self, codes):
        return self.decode_codes(codes)

    def decode_codes(self, codes):
        """[B, n_q, T] -> waveform [B, T * hop_length]."""
        z = self.quantizer.decode(codes)
        wav = self.decoder(z)
        return wav[..., 0]

    def encode(self, wav, n_q: int = 0):
        """[B, T] waveform -> [B, n_q, T//hop] codes (0 = all quantizers)."""
        z = self.encoder(wav[..., None])
        return self.quantizer.encode(z, n_q or self.cfg.num_quantizers)


def init_encodec(cfg: EncodecConfig, key):
    """Init touching BOTH directions so one variables tree serves
    decode_codes and encode."""
    model = EncodecModel(cfg)

    def init_all(mdl):
        codes = jnp.zeros((1, cfg.num_quantizers, 8), jnp.int32)
        wav = jnp.zeros((1, 8 * cfg.hop_length))
        mdl.decode_codes(codes)
        mdl.encode(wav)
        return ()

    variables = nn.init(init_all, model)(key)
    return model, variables
