"""Prosody-SpeechT5: prosody-aware expressive TTS on the SpeechT5 substrate.

The reference repo advertises this family with NO code in-tree
(reference README.md:17,24-28 links the ICASSP 2023 paper, arXiv
2211.11275 "Prosody-aware SpeechT5 for Expressive Neural TTS").  This
implementation is built from the paper's published architecture
description — like models/vallex.py and models/viola.py it is a
paper-level reconstruction, not a port, and the detailed hyperparameters
(unpublished) follow SpeechT5 conventions:

- a **prosody encoder** distills an utterance-level prosody embedding
  from the reference mel (during training: the target itself — the
  standard expressive-TTS teacher);
- a **prosody predictor** regresses that embedding from the text encoding
  alone, so inference needs no reference audio (L2 distillation against
  the stop-gradiented encoder output);
- the embedding **conditions the TTS decoder** by projection-and-add on
  the encoder output, alongside the x-vector speaker conditioning.

Inference modes (both drive the stock decode.tts.TTSDecoder loop):
- ``encode_text``        : predictor prosody (text-only, expressive);
- ``encode_text_ref``    : prosody TRANSFER from a reference utterance.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SpeechT5Config
from ..utils.masks import length_mask
from .speecht5 import SpeechT5Model


@dataclass(frozen=True)
class ProsodyConfig:
    dim: int = 64              # prosody embedding size
    conv_channels: int = 128   # prosody-encoder conv width
    n_convs: int = 3           # stride-2 conv stack depth
    predictor_hidden: int = 256
    pred_loss_weight: float = 1.0


class ProsodyEncoder(nn.Module):
    """Reference mel [B, T, M] (+lengths) -> utterance prosody [B, P].

    Stride-2 conv stack -> masked mean pool -> bounded projection (tanh,
    GST-style, keeps the conditioning bounded for stable transfer)."""

    pcfg: ProsodyConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, mel_lengths):
        x = mel.astype(self.dtype)
        lengths = mel_lengths
        for i in range(self.pcfg.n_convs):
            x = nn.Conv(self.pcfg.conv_channels, (3,), strides=(2,),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = jax.nn.relu(x)
            lengths = (lengths + 1) // 2
        valid = length_mask(lengths, x.shape[1])
        x = jnp.where(valid[:, :, None], x, 0.0)
        pooled = x.sum(1) / jnp.maximum(
            lengths[:, None].astype(x.dtype), 1.0)
        return jnp.tanh(
            nn.Dense(self.pcfg.dim, dtype=self.dtype, name="out")(pooled)
        )


class ProsodyPredictor(nn.Module):
    """Text encoding [B, L, D] (+valid) -> predicted prosody [B, P]."""

    pcfg: ProsodyConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_out, valid):
        x = jnp.where(valid[:, :, None], enc_out.astype(self.dtype), 0.0)
        n = jnp.maximum(valid.sum(-1, keepdims=True).astype(x.dtype), 1.0)
        pooled = x.sum(1) / n
        h = jax.nn.relu(nn.Dense(self.pcfg.predictor_hidden,
                                 dtype=self.dtype, name="fc1")(pooled))
        return jnp.tanh(
            nn.Dense(self.pcfg.dim, dtype=self.dtype, name="out")(h)
        )


class ProsodySpeechT5(nn.Module):
    """SpeechT5 backbone + prosody encoder/predictor/conditioning."""

    cfg: SpeechT5Config
    pcfg: ProsodyConfig = ProsodyConfig()

    def setup(self):
        dt = self.cfg.compute_dtype
        self.backbone = SpeechT5Model(self.cfg)
        self.prosody_encoder = ProsodyEncoder(self.pcfg, dt)
        self.prosody_predictor = ProsodyPredictor(self.pcfg, dt)
        self.prosody_proj = nn.Dense(
            self.cfg.decoder.d_model, dtype=dt, name="prosody_proj"
        )

    # ------------------------------------------------------------ helpers

    def _condition(self, enc, prosody):
        out = enc["encoder_out"] + self.prosody_proj(prosody)[:, None, :]
        return {**enc, "encoder_out": out}

    # ------------------------------------------------------------ training

    def forward_t2s(self, tokens, prev_mel, tgt_lengths, spkembs,
                    target_mel, dec_lengths, *, deterministic=False):
        """Teacher-forced prosody-aware TTS.

        Returns (before, after, stop_logits, attn, pred_loss): the TTS
        tuple for criterions.tts_loss plus the prosody-distillation L2
        (weight pcfg.pred_loss_weight; add to the criterion total)."""
        enc = self.backbone.encode_text(tokens, deterministic=deterministic)
        p_ref = self.prosody_encoder(target_mel, dec_lengths)
        valid = tokens != self.cfg.pad_id
        p_hat = self.prosody_predictor(enc["encoder_out"], valid)
        pred_loss = jnp.mean(
            (p_hat.astype(jnp.float32)
             - jax.lax.stop_gradient(p_ref).astype(jnp.float32)) ** 2
        )
        enc = self._condition(enc, p_ref)   # teacher: ground-truth prosody
        before, after, stop_logits, attn = self.backbone.decode_speech(
            enc, prev_mel, tgt_lengths, spkembs,
            deterministic=deterministic, need_attn=True,
        )
        return before, after, stop_logits, attn, pred_loss

    # ----------------------------------------------------------- inference
    # Method names/signatures match what decode.tts.TTSDecoder drives, so
    # the stock jitted AR loop works unchanged.

    def encode_text(self, tokens, *, deterministic=True):
        """Predictor-prosody encoding: expressive TTS with no reference."""
        enc = self.backbone.encode_text(tokens, deterministic=deterministic)
        p = self.prosody_predictor(
            enc["encoder_out"], tokens != self.cfg.pad_id)
        return self._condition(enc, p)

    def encode_text_ref(self, tokens, ref_mel, ref_lengths, *,
                        deterministic=True):
        """Prosody-transfer encoding: style from a reference utterance."""
        enc = self.backbone.encode_text(tokens, deterministic=deterministic)
        p = self.prosody_encoder(ref_mel, ref_lengths)
        return self._condition(enc, p)

    def prosody_embedding(self, ref_mel, ref_lengths):
        return self.prosody_encoder(ref_mel, ref_lengths)

    def integrate_spk_embed(self, enc, spkembs):
        return self.backbone.integrate_spk_embed(enc, spkembs)

    def decode_speech(self, *a, **kw):
        """Teacher-forced decode from an (already prosody-conditioned)
        encoding — pair with encode_text / encode_text_ref."""
        return self.backbone.decode_speech(*a, **kw)

    def init_speech_cache(self, *a, **kw):
        return self.backbone.init_speech_cache(*a, **kw)

    def speech_decode_step(self, *a, **kw):
        return self.backbone.speech_decode_step(*a, **kw)

    def postnet_refine(self, mel, deterministic=True):
        return self.backbone.postnet_refine(mel, deterministic)

    def init_all(self, tokens, prev_mel, tgt_lengths, spkembs, target_mel,
                 dec_lengths):
        out = self.forward_t2s(tokens, prev_mel, tgt_lengths, spkembs,
                               target_mel, dec_lengths, deterministic=True)
        _ = self.encode_text(tokens)
        return out[0]


def init_prosody_speecht5(cfg: SpeechT5Config, key,
                          pcfg: ProsodyConfig = ProsodyConfig()):
    model = ProsodySpeechT5(cfg, pcfg)
    r = cfg.reduction_factor
    tokens = jnp.full((1, 4), 5, jnp.int32)
    mel_len = 8 * r
    prev = jnp.zeros((1, mel_len // r, cfg.n_mels))
    tgt = jnp.zeros((1, mel_len, cfg.n_mels))
    lengths = jnp.asarray([mel_len], jnp.int32)
    spk = (jnp.zeros((1, cfg.spk_embed_dim))
           if cfg.spk_embed_dim is not None else None)
    variables = model.init(
        {"params": key, "prenet": jax.random.fold_in(key, 1)},
        tokens, prev, lengths // r, spk, tgt, lengths, method="init_all",
    )
    return model, variables
