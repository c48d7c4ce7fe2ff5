"""FastText2Unit: non-autoregressive phoneme -> unit tokenizer (SpeechLM-P).

Behavioral spec from reference SpeechLM/speechlm/models/fasttext2unit.py:23-226
(FastText2UnitModel on fairseq's FastSpeech2Encoder) + criterion
speechlm/criterions/fasttext2unit_loss.py:58-140:
- phoneme embedding + sinusoidal positions -> N FFT blocks (self-attention +
  kernel-9 conv FFN, post-LN residuals);
- variance adaptor: duration predictor (2x [conv -> relu -> LN -> dropout] ->
  linear) on log(dur+1); pitch/energy predictors exist but the shipped
  fasttext2unit_s arch disables them (use_pitch/use_energe default False);
- length regulator expands each position by its duration;
- decoder FFT blocks over the expanded sequence -> linear to the unit vocab;
- loss: label-smoothed CE over regulated frames + dur_loss_weight * MSE on
  log-durations.

TPU-first departure: the reference length regulator builds dynamic-length
sequences on the host; here regulation is a static-shape gather —
``idx[t] = searchsorted(cumsum(dur), t, 'right')`` into a fixed max-length
buffer with a validity mask — so the whole model jits, batches, and shards.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig, RelPosConfig
from ..ops.positional import fairseq_sinusoidal
from ..utils.masks import length_mask
from .attention import MultiheadAttention


@dataclass(frozen=True)
class FastText2UnitConfig:
    src_vocab_size: int = 128        # phonemes
    unit_vocab_size: int = 504       # km units
    pad_id: int = 1
    d_model: int = 256
    ffn_dim: int = 1024              # fft_hidden_dim
    fft_kernel_size: int = 9
    encoder_layers: int = 4
    decoder_layers: int = 4
    num_heads: int = 2
    dropout: float = 0.2
    attention_dropout: float = 0.0
    var_pred_hidden_dim: int = 256
    var_pred_kernel_size: int = 3
    var_pred_dropout: float = 0.5
    speaker_embed_dim: int = 0       # 0 = no speaker conditioning
    max_target_len: int = 1024       # static length-regulator buffer
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def fastspeech2_s(**kw) -> FastText2UnitConfig:
    """fasttext2unit_s (reference fasttext2unit.py:137-166)."""
    import dataclasses

    return dataclasses.replace(FastText2UnitConfig(), **kw)


def fastspeech2_tiny(**kw) -> FastText2UnitConfig:
    import dataclasses

    cfg = FastText2UnitConfig(
        src_vocab_size=16, unit_vocab_size=12, d_model=32, ffn_dim=64,
        fft_kernel_size=3, encoder_layers=2, decoder_layers=2, num_heads=2,
        dropout=0.0, var_pred_hidden_dim=16, max_target_len=64,
    )
    return dataclasses.replace(cfg, **kw)


class FFTBlock(nn.Module):
    """FastSpeech2 FFT block: self-attn + conv FFN, post-LN residuals
    (fairseq fastspeech2.FFTLayer semantics)."""

    cfg: FastText2UnitConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.self_attn = MultiheadAttention(
            cfg.d_model, cfg.num_heads, cfg.attention_dropout,
            dtype=self.dtype, name="self_attn",
        )
        self.layer_norm = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")
        self.conv1 = nn.Conv(
            cfg.ffn_dim, (cfg.fft_kernel_size,), padding="SAME",
            dtype=self.dtype, name="conv1",
        )
        self.conv2 = nn.Conv(
            cfg.d_model, (cfg.fft_kernel_size,), padding="SAME",
            dtype=self.dtype, name="conv2",
        )
        self.ffn_norm = nn.LayerNorm(dtype=jnp.float32, name="ffn_norm")
        self.drop = nn.Dropout(cfg.dropout)

    def __call__(self, x, valid, deterministic=True):
        residual = x
        y, _, _ = self.self_attn(
            x, key_valid=valid, deterministic=deterministic
        )
        x = self.layer_norm(
            residual + self.drop(y, deterministic=deterministic)
        ).astype(self.dtype)
        residual = x
        y = self.conv2(jax.nn.relu(self.conv1(x)))
        x = self.ffn_norm(
            residual + self.drop(y, deterministic=deterministic)
        ).astype(self.dtype)
        return x * valid[..., None].astype(x.dtype)


class VariancePredictor(nn.Module):
    """conv -> relu -> LN -> dropout, x2, -> linear(1)
    (fairseq fastspeech2.VariancePredictor semantics)."""

    cfg: FastText2UnitConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        for i in range(2):
            x = nn.Conv(
                cfg.var_pred_hidden_dim, (cfg.var_pred_kernel_size,),
                padding="SAME", dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(dtype=jnp.float32, name=f"ln_{i}")(x).astype(
                self.dtype
            )
            x = nn.Dropout(cfg.var_pred_dropout)(
                x, deterministic=deterministic
            )
        return nn.Dense(1, dtype=jnp.float32, name="proj")(x)[..., 0]


def length_regulate(x, durations, max_len: int):
    """Expand x [B, T, D] by integer durations [B, T] into a fixed [B, max_len, D]
    buffer.  out[t] = x[searchsorted(cumsum(dur), t, 'right')]; positions past
    sum(dur) are masked invalid.  Static shapes, pure gather — jit/shard-safe
    (the reference's LengthRegulator materializes python lists per utterance).
    """
    cum = jnp.cumsum(durations, axis=-1)                  # [B, T]
    t = jnp.arange(max_len)

    def one(cum_b):
        return jnp.searchsorted(cum_b, t, side="right")

    idx = jax.vmap(one)(cum)                              # [B, max_len]
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    out_lens = jnp.minimum(cum[:, -1], max_len)
    valid = length_mask(out_lens, max_len)
    return out * valid[..., None].astype(x.dtype), out_lens, valid


class FastText2Unit(nn.Module):
    """Phoneme -> unit NAR model (SpeechLM-P's paired 'tokenizer')."""

    cfg: FastText2UnitConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.embed_tokens = nn.Embed(
            cfg.src_vocab_size, cfg.d_model, name="embed_tokens"
        )
        self.enc_layers = [
            FFTBlock(cfg, dt, name=f"enc_{i}") for i in range(cfg.encoder_layers)
        ]
        self.dec_layers = [
            FFTBlock(cfg, dt, name=f"dec_{i}") for i in range(cfg.decoder_layers)
        ]
        self.duration_predictor = VariancePredictor(
            cfg, dt, name="duration_predictor"
        )
        self.out_proj = nn.Dense(
            cfg.unit_vocab_size, dtype=jnp.float32, name="out_proj"
        )
        if cfg.speaker_embed_dim:
            self.spk_proj = nn.Dense(cfg.d_model, dtype=dt, name="spk_proj")
        self.drop = nn.Dropout(cfg.dropout)

    def encode(self, src_tokens, deterministic=True):
        cfg = self.cfg
        valid = src_tokens != cfg.pad_id
        x = self.embed_tokens(src_tokens).astype(cfg.compute_dtype)
        x = x + fairseq_sinusoidal(valid, cfg.d_model).astype(x.dtype)
        x = self.drop(x, deterministic=deterministic)
        for layer in self.enc_layers:
            x = layer(x, valid, deterministic=deterministic)
        return x, valid

    def __call__(self, src_tokens, durations=None, spkembs=None, *,
                 deterministic=True, d_factor: float = 1.0):
        """Returns (logits [B, Lmax, V], out_lens [B], out_valid [B, Lmax],
        log_dur_out [B, T]).  Training passes ground-truth ``durations``;
        generation uses the predicted ones (reference fasttext2unit.py:29-63).
        """
        cfg = self.cfg
        x, valid = self.encode(src_tokens, deterministic=deterministic)
        if cfg.speaker_embed_dim and spkembs is not None:
            x = x + self.spk_proj(spkembs)[:, None, :].astype(x.dtype)

        log_dur_out = self.duration_predictor(x, deterministic=deterministic)
        if durations is None:
            durations = jnp.maximum(
                jnp.round((jnp.exp(log_dur_out) - 1.0) * d_factor), 0.0
            ).astype(jnp.int32)
        durations = durations * valid.astype(durations.dtype)

        y, out_lens, out_valid = length_regulate(
            x, durations, cfg.max_target_len
        )
        y = y + fairseq_sinusoidal(out_valid, cfg.d_model).astype(y.dtype) \
            * out_valid[..., None].astype(y.dtype)
        for layer in self.dec_layers:
            y = layer(y, out_valid, deterministic=deterministic)
        logits = self.out_proj(y.astype(jnp.float32))
        return logits, out_lens, out_valid, log_dur_out

    def generate(self, src_tokens, spkembs=None, d_factor: float = 1.0):
        """NAR unit generation: argmax over the regulated frames
        (reference speechlm/generate_unit.py + unit_generator.py)."""
        logits, out_lens, out_valid, _ = self(
            src_tokens, spkembs=spkembs, deterministic=True, d_factor=d_factor
        )
        units = jnp.argmax(logits, axis=-1)
        return units, out_lens, out_valid


def init_fastspeech2(cfg: FastText2UnitConfig, rng):
    model = FastText2Unit(cfg)
    toks = jnp.full((1, 4), cfg.pad_id + 1, jnp.int32)
    spk = (
        jnp.zeros((1, cfg.speaker_embed_dim)) if cfg.speaker_embed_dim else None
    )
    variables = jax.jit(
        lambda: model.init({"params": rng}, toks, spkembs=spk)
    )()
    return model, variables
