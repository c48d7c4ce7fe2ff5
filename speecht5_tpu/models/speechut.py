"""SpeechUT / Speech2S: hidden-unit bridge encoder-decoder pretraining.

Behavioral spec from reference SpeechUT/speechut/models/speechut.py:47-785
(SpeechutModel; Speech2S's model files are byte-identical — SURVEY.md 2.3):
- speech branch: HuBERT front (conv FE + masking + speech encoder) -> hubert
  logits over units -> embedding mixing with unit embeddings incl. swap of
  unmasked positions (:476-497) -> unit encoder -> (optionally) text decoder;
- unit/text branches: masked unit modeling (forward_mum, :670), paired
  unit->text seq2seq with CE + CTC over the unit encoder;
- fine-tunes: ASR with joint CTC+CE (models/speechut_asr.py:27), ST seq2seq
  (models/speechut_st.py:36); decode via the shared jitted ASRDecoder.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace as dc_replace
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig, ConvFeatureConfig, MaskingConfig, RelPosConfig
from ..ops.masking import apply_feature_masks, compute_span_mask
from ..utils.masks import length_mask
from ..ops.heads import cosine_logits
from .prenets import ConvFeatureExtractor, WeightNormConv1d, TextDecoderPrenet
from .encoder import TransformerEncoder
from .decoder import TransformerDecoder


@dataclass(frozen=True)
class SpeechUTConfig:
    speech_encoder: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(num_layers=6)
    )
    unit_encoder: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(num_layers=6)
    )
    decoder: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(num_layers=6, use_rel_pos_bias=False)
    )
    conv_features: ConvFeatureConfig = field(default_factory=ConvFeatureConfig)
    masking: MaskingConfig = field(default_factory=MaskingConfig)
    unit_vocab_size: int = 504
    text_vocab_size: int = 1000
    pad_id: int = 1
    eos_id: int = 2
    blank_id: int = 4
    final_dim: int = 256
    logit_temp: float = 0.1
    use_conv_pos: bool = True
    conv_pos: int = 128
    conv_pos_groups: int = 16
    mix_with_unit: bool = True
    add_text_ctc: bool = True
    max_text_positions: int = 600
    dtype: str = "float32"

    @property
    def d_model(self):
        return self.speech_encoder.d_model

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    # TextDecoderPrenet compatibility
    @property
    def vocab_size(self):
        return self.text_vocab_size

    @property
    def decoder_cfg(self):
        return self.decoder


def speechut_tiny(**kw) -> SpeechUTConfig:
    enc = TransformerConfig(
        d_model=64, ffn_dim=128, num_layers=2, num_heads=4,
        dropout=0.0, attention_dropout=0.0, rel_pos=RelPosConfig(max_distance=16),
    )
    dec = dc_replace(enc, use_rel_pos_bias=False)
    cfg = SpeechUTConfig(
        speech_encoder=enc, unit_encoder=enc, decoder=dec,
        conv_features=ConvFeatureConfig(layers=((32, 10, 5), (32, 8, 4), (64, 4, 4))),
        unit_vocab_size=24, text_vocab_size=20, final_dim=16,
        conv_pos=16, conv_pos_groups=4, max_text_positions=64,
    )
    return dc_replace(cfg, **kw)


class _TextPrenet(nn.Module):
    """Minimal embedding+positions prenet for the text decoder (shares the
    fairseq conventions of TextDecoderPrenet)."""

    vocab_size: int
    d_model: int
    pad_id: int
    max_positions: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.vocab_size, self.d_model, param_dtype=jnp.float32
        )

    def __call__(self, tokens):
        from ..ops.positional import fairseq_sinusoidal

        valid = tokens != self.pad_id
        x = self.embed_tokens(tokens).astype(self.dtype)
        x = x + fairseq_sinusoidal(valid, self.d_model, self.pad_id).astype(self.dtype)
        return x, valid

    def step(self, tokens_t, position):
        from ..ops.positional import fairseq_sinusoidal_table

        x = self.embed_tokens(tokens_t).astype(self.dtype)
        table = jnp.asarray(fairseq_sinusoidal_table(
            self.pad_id + 2 + self.max_positions, self.d_model, self.pad_id
        ))
        return x + table[self.pad_id + 1 + position][None, None, :].astype(self.dtype)


class SpeechUTModel(nn.Module):
    cfg: SpeechUTConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.feature_extractor = ConvFeatureExtractor(cfg.conv_features, dt)
        self.feat_layer_norm = nn.LayerNorm(dtype=jnp.float32)
        if cfg.conv_features.out_dim != cfg.d_model:
            self.post_extract_proj = nn.Dense(cfg.d_model, dtype=dt)
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(1.0), (cfg.d_model,), jnp.float32
        )
        if cfg.use_conv_pos:
            self.pos_conv = WeightNormConv1d(
                cfg.d_model, cfg.conv_pos, cfg.conv_pos_groups, dt
            )
        self.encoder = TransformerEncoder(cfg.speech_encoder, dtype=dt)
        self.unit_encoder = TransformerEncoder(cfg.unit_encoder, dtype=dt)
        self.unit_embed_tokens = nn.Embed(
            cfg.unit_vocab_size, cfg.d_model, param_dtype=jnp.float32
        )
        self.final_proj = nn.Dense(cfg.final_dim, dtype=jnp.float32)
        self.label_embs = self.param(
            "label_embs", nn.initializers.uniform(1.0),
            (cfg.unit_vocab_size, cfg.final_dim), jnp.float32,
        )
        self.decoder = TransformerDecoder(cfg.decoder, dtype=dt)
        self.text_prenet = _TextPrenet(
            cfg.text_vocab_size, cfg.d_model, cfg.pad_id, cfg.max_text_positions, dt
        )
        self.output_projection = nn.Dense(
            cfg.text_vocab_size, use_bias=False, dtype=jnp.float32
        )
        if cfg.add_text_ctc:
            self.text_ctc_head = nn.Dense(cfg.text_vocab_size, dtype=jnp.float32)

    def _cosine_logits(self, proj):
        return cosine_logits(proj, self.label_embs, self.cfg.logit_temp)

    def init_all(self, wav, wav_lengths, units, prev_tokens):
        out = self.forward_speech(wav, wav_lengths, units, mask=True)
        _ = self.forward_mum(units)
        _ = self.decode_text(
            {"encoder_out": out["encoder_out"], "valid_mask": out["valid_mask"]},
            prev_tokens,
        )
        _ = self.forward_unit_text(units, prev_tokens)
        return out["encoder_out"]

    # ---------------------------------------------------------------- speech

    def encode_speech(self, wav, wav_lengths, *, mask=False, deterministic=True,
                      with_ctc=False, targets=None):
        """Full stack: conv front -> speech encoder -> (mix) -> unit encoder."""
        cfg = self.cfg
        feats = self.feature_extractor(wav)
        features_pen = jnp.mean(feats.astype(jnp.float32) ** 2)
        frame_lengths = cfg.conv_features.out_length(wav_lengths)
        valid = length_mask(frame_lengths, feats.shape[1])
        x = self.feat_layer_norm(feats).astype(feats.dtype)
        if hasattr(self, "post_extract_proj"):
            x = self.post_extract_proj(x)
        time_mask = None
        if mask and cfg.masking.mask_prob > 0:
            x, time_mask = apply_feature_masks(
                self.make_rng("mask"), x, frame_lengths, self.mask_emb,
                mask_prob=cfg.masking.mask_prob,
                mask_length=cfg.masking.mask_length,
            )
        if cfg.use_conv_pos:
            x = x + jax.nn.gelu(self.pos_conv(x), approximate=False)
        enc = self.encoder(x, valid, deterministic=deterministic)
        h = enc["encoder_out"]

        hubert_logits = None
        if targets is not None:
            hubert_logits = self._cosine_logits(
                self.final_proj(h.astype(jnp.float32))
            )
            # embedding mixing incl. swap of unmasked positions (:476-497)
            if cfg.mix_with_unit:
                lengths = valid.astype(jnp.int32).sum(-1)
                sel = compute_span_mask(
                    self.make_rng("mix"), lengths, h.shape[1],
                    cfg.masking.mask_prob / 2,
                    max(cfg.masking.mask_length // 2, 1),
                )
                if time_mask is not None:
                    sel = sel & (~time_mask)
                ue = self.unit_embed_tokens(targets).astype(h.dtype)
                h = jnp.where(sel[:, :, None], ue, h)

        uenc = self.unit_encoder(h, valid, deterministic=deterministic)
        out = {
            "encoder_out": uenc["encoder_out"],
            "valid_mask": valid,
            "time_mask": time_mask,
            "features_pen": features_pen,
            "hubert_logits": hubert_logits,
        }
        if with_ctc and cfg.add_text_ctc:
            out["ctc_logits"] = self.text_ctc_head(
                uenc["encoder_out"].astype(jnp.float32)
            )
        return out

    def forward_speech(self, wav, wav_lengths, targets, *, mask=True,
                       deterministic=True):
        return self.encode_speech(
            wav, wav_lengths, mask=mask, deterministic=deterministic,
            targets=targets,
        )

    # ------------------------------------------------------------- unit/text

    def forward_mum(self, units, *, deterministic=True):
        """Masked unit modeling on mono units (reference speechut.py:670)."""
        cfg = self.cfg
        valid = units != cfg.pad_id
        x = self.unit_embed_tokens(units).astype(cfg.compute_dtype)
        lengths = valid.astype(jnp.int32).sum(-1)
        x, time_mask = apply_feature_masks(
            self.make_rng("mask"), x, lengths, self.mask_emb,
            mask_prob=cfg.masking.mask_prob, mask_length=cfg.masking.mask_length,
        )
        enc = self.unit_encoder(x, valid, deterministic=deterministic)
        logits = self._cosine_logits(
            self.final_proj(enc["encoder_out"].astype(jnp.float32))
        )
        return {"mum_logits": logits, "time_mask": time_mask, "valid_mask": valid}

    def forward_unit_text(self, units, prev_tokens, *, deterministic=True):
        """Paired unit->text: unit encoder -> decoder CE (+ CTC head)."""
        cfg = self.cfg
        valid = units != cfg.pad_id
        x = self.unit_embed_tokens(units).astype(cfg.compute_dtype)
        enc = self.unit_encoder(x, valid, deterministic=deterministic)
        enc_d = {"encoder_out": enc["encoder_out"], "valid_mask": valid}
        logits = self.decode_text(enc_d, prev_tokens, deterministic=deterministic)
        out = {"dec_logits": logits, "valid_mask": valid}
        if cfg.add_text_ctc:
            out["ctc_logits"] = self.text_ctc_head(
                enc["encoder_out"].astype(jnp.float32)
            )
        return out

    # ----------------------------------------------------------------- decode

    def decode_text(self, enc, prev_tokens, *, deterministic=True):
        x, self_valid = self.text_prenet(prev_tokens)
        feats, _ = self.decoder(
            x, enc["encoder_out"], enc_valid=enc["valid_mask"],
            self_valid=self_valid, deterministic=deterministic,
        )
        return self.output_projection(feats.astype(jnp.float32))

    def init_text_cache(self, enc, batch_size: int, max_len: int):
        return self.decoder.init_cache(enc["encoder_out"], batch_size, max_len)

    def text_decode_step(self, tokens_t, cache, *, enc_valid=None,
                         cache_rows=None):
        x = self.text_prenet.step(tokens_t, cache["index"])
        feats, new_cache, _ = self.decoder.decode_step(
            x, cache, enc_valid=enc_valid, cache_rows=cache_rows)
        return self.output_projection(feats.astype(jnp.float32))[:, 0], new_cache
