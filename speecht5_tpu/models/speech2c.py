"""Speech2C: HuBERT pretraining with a code-predicting transformer decoder.

Behavioral spec from reference Speech2C/speech2c/models/speech2c.py:111
(Speech2cModel extends fairseq HubertModel):
- conv feature extractor -> masking -> transformer encoder -> HuBERT
  masked/unmasked logits (km codes);
- plus a 6-layer transformer decoder doing seq2seq prediction of the
  deduplicated code sequence (masked-unit seq2seq; dataset adds decoder code
  targets, reference data/speech2c_dataset.py:19);
- ASR fine-tune: encoder-decoder with joint CTC + CE
  (reference models/speech2c_asr.py:38, criterions/ctc_ce.py:87) and beam decode
  with CTC prefix scoring — served here by decode/asr.ASRDecoder.

Built on the SpeechT5 substrate (same prenet/encoder/decoder modules), exposed
with the ``text_decode_step`` / ``encode_speech`` API so ASRDecoder works as-is.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace as dc_replace

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import (
    SpeechT5Config, TransformerConfig, ConvFeatureConfig, MaskingConfig,
    HubertHeadConfig, RelPosConfig, speecht5_tiny,
)
from .prenets import SpeechEncoderPrenet, TextDecoderPrenet
from .postnets import TextDecoderPostnet, SpeechEncoderPostnet
from .encoder import TransformerEncoder
from .decoder import TransformerDecoder


def speech2c_base(**kw) -> SpeechT5Config:
    """Speech2C base: 12-layer encoder, 6-layer decoder over code vocab."""
    cfg = SpeechT5Config(
        encoder=TransformerConfig(layer_norm_first=False),
        decoder=TransformerConfig(num_layers=6, use_rel_pos_bias=False),
        masking=MaskingConfig(mask_prob=0.80),
        vocab_size=504,  # km codes + specials
    )
    return dc_replace(cfg, **kw)


class Speech2CModel(nn.Module):
    """Same API surface as SpeechT5Model's speech->text paths so the jitted
    ASRDecoder / beam search reuse applies unchanged."""

    cfg: SpeechT5Config

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.speech_encoder_prenet = SpeechEncoderPrenet(cfg, dt)
        self.encoder = TransformerEncoder(
            cfg.encoder, ctc_vocab_size=cfg.vocab_size, dtype=dt
        )
        self.decoder = TransformerDecoder(cfg.decoder, dtype=dt)
        self.text_decoder_prenet = TextDecoderPrenet(cfg, dt)
        self.text_decoder_postnet = TextDecoderPostnet(cfg, dt)
        self.speech_encoder_postnet = SpeechEncoderPostnet(cfg, dt)

    def init_all(self, wav, wav_lengths, prev_tokens):
        enc = self.encode_speech(wav, wav_lengths, mask=True, with_ctc=True)
        _ = self.speech_encoder_postnet(enc["encoder_out"])
        return self.decode_text(enc, prev_tokens)

    def encode_speech(self, wav, wav_lengths, *, mask=False, deterministic=True,
                      with_ctc=False):
        x, valid, time_mask, feat_pen = self.speech_encoder_prenet(
            wav, wav_lengths, mask=mask, deterministic=deterministic
        )
        enc = self.encoder(x, valid, deterministic=deterministic, with_ctc=with_ctc)
        enc["time_mask"] = time_mask
        enc["features_pen"] = feat_pen
        return enc

    def decode_text(self, enc, prev_tokens, *, deterministic=True):
        x, self_valid = self.text_decoder_prenet(prev_tokens, deterministic=deterministic)
        feats, _ = self.decoder(
            x, enc["encoder_out"], enc_valid=enc["valid_mask"],
            self_valid=self_valid, deterministic=deterministic,
        )
        return self.text_decoder_postnet(feats)

    def init_text_cache(self, enc, batch_size: int, max_len: int):
        return self.decoder.init_cache(enc["encoder_out"], batch_size, max_len)

    def text_decode_step(self, tokens_t, cache, *, enc_valid=None,
                         cache_rows=None):
        x = self.text_decoder_prenet.step(tokens_t, cache["index"])
        feats, new_cache, _ = self.decoder.decode_step(
            x, cache, enc_valid=enc_valid, cache_rows=cache_rows)
        return self.text_decoder_postnet(feats)[:, 0], new_cache

    def forward_pretrain(self, wav, wav_lengths, code_prev, *, deterministic=False):
        """Joint HuBERT + code seq2seq pretraining.  code_prev: EOS-shifted
        deduplicated code sequence (reference criterions/speech2c_criterion.py:42)."""
        enc = self.encode_speech(
            wav, wav_lengths, mask=True, deterministic=deterministic
        )
        hubert_logits = self.speech_encoder_postnet(enc["encoder_out"])
        dec_logits = self.decode_text(enc, code_prev, deterministic=deterministic)
        return {
            "hubert_logits": hubert_logits,
            "dec_logits": dec_logits,
            "time_mask": enc["time_mask"],
            "valid_mask": enc["valid_mask"],
            "features_pen": enc["features_pen"],
        }

    def forward_asr(self, wav, wav_lengths, prev_tokens, *, mask=True,
                    deterministic=False):
        """ASR fine-tune: joint CTC + CE (reference criterions/ctc_ce.py:87)."""
        enc = self.encode_speech(
            wav, wav_lengths, mask=mask, deterministic=deterministic, with_ctc=True
        )
        logits = self.decode_text(enc, prev_tokens, deterministic=deterministic)
        return logits, enc["ctc_logits"], enc["valid_mask"]
