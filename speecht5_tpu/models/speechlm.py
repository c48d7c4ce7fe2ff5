"""SpeechLM: HuBERT-style speech encoder + shared unit/text encoder.

Behavioral spec from reference SpeechLM/speechlm/models/speechlm.py:46-720
(SpeechlmModel):
- speech branch: conv feature extractor -> masking -> speech transformer
  encoder -> HuBERT logits (level 0) -> ``convert_embeddings``: project states
  to unit-embedding space, optionally swap a random subset of *unmasked*
  positions with ground-truth unit embeddings (:392-462, "embedding mixing"),
  optional l2 tie loss -> unit encoder -> HuBERT logits (level 1);
- text/unit branch: unit embeddings -> masking -> unit encoder -> masked-unit
  LM logits (+ char CTC head over the unit encoder, :584-631);
- fine-tune surfaces: ``extract_features`` (CTC ASR head on top,
  models/speechlm_ctcasr.py:22-56) and an encoder-decoder ST head
  (models/speechlm_st.py:93-268).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig, ConvFeatureConfig, MaskingConfig, RelPosConfig
from ..ops.masking import apply_feature_masks, compute_span_mask
from ..utils.masks import length_mask
from ..ops.heads import cosine_logits
from .prenets import ConvFeatureExtractor, WeightNormConv1d
from .encoder import TransformerEncoder
from .decoder import TransformerDecoder


@dataclass(frozen=True)
class SpeechLMConfig:
    speech_encoder: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(num_layers=6)
    )
    unit_encoder: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(num_layers=6)
    )
    conv_features: ConvFeatureConfig = field(default_factory=ConvFeatureConfig)
    masking: MaskingConfig = field(default_factory=MaskingConfig)
    unit_vocab_size: int = 504       # km units (level-0 and unit-encoder input)
    text_vocab_size: int = 32        # characters for the text CTC head
    pad_id: int = 1
    final_dim: int = 256
    logit_temp: float = 0.1
    use_conv_pos: bool = True
    conv_pos: int = 128
    conv_pos_groups: int = 16
    mix_with_unit: bool = True       # embedding mixing on the speech branch
    l2_embedding: bool = False
    compute_mum: bool = True         # masked unit modeling on the text branch
    add_text_ctc: bool = True
    dtype: str = "float32"

    @property
    def d_model(self):
        return self.speech_encoder.d_model

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def speechlm_tiny(**kw) -> SpeechLMConfig:
    import dataclasses

    enc = TransformerConfig(
        d_model=64, ffn_dim=128, num_layers=2, num_heads=4,
        dropout=0.0, attention_dropout=0.0, rel_pos=RelPosConfig(max_distance=16),
    )
    cfg = SpeechLMConfig(
        speech_encoder=enc,
        unit_encoder=enc,
        conv_features=ConvFeatureConfig(layers=((32, 10, 5), (32, 8, 4), (64, 4, 4))),
        unit_vocab_size=24,
        text_vocab_size=16,
        final_dim=16,
        conv_pos=16,
        conv_pos_groups=4,
    )
    return dataclasses.replace(cfg, **kw)


class SpeechLMModel(nn.Module):
    cfg: SpeechLMConfig

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
        # level-0 (speech encoder out) and level-1 (unit encoder out) heads
        self.final_proj_0 = nn.Dense(cfg.final_dim, dtype=jnp.float32)
        self.final_proj_1 = nn.Dense(cfg.final_dim, dtype=jnp.float32)
        self.label_embs_0 = self.param(
            "label_embs_0", nn.initializers.uniform(1.0),
            (cfg.unit_vocab_size, cfg.final_dim), jnp.float32,
        )
        self.label_embs_1 = self.param(
            "label_embs_1", nn.initializers.uniform(1.0),
            (cfg.unit_vocab_size, cfg.final_dim), jnp.float32,
        )
        if cfg.add_text_ctc:
            self.unit_encoder_ctc_head = nn.Dense(
                cfg.text_vocab_size, dtype=jnp.float32
            )

    # ------------------------------------------------------------- internals

    def _cosine_logits(self, proj, label_embs):
        return cosine_logits(proj, label_embs, self.cfg.logit_temp)

    def _front(self, wav, wav_lengths, *, mask, deterministic):
        cfg = self.cfg
        feats = self.feature_extractor(wav)
        features_pen = jnp.mean(feats.astype(jnp.float32) ** 2)
        frames = feats.shape[1]
        frame_lengths = cfg.conv_features.out_length(wav_lengths)
        valid = length_mask(frame_lengths, frames)
        x = self.feat_layer_norm(feats).astype(feats.dtype)
        if hasattr(self, "post_extract_proj"):
            x = self.post_extract_proj(x)
        time_mask = None
        if mask and cfg.masking.mask_prob > 0:
            x, time_mask = apply_feature_masks(
                self.make_rng("mask"), x, frame_lengths, self.mask_emb,
                mask_prob=cfg.masking.mask_prob,
                mask_length=cfg.masking.mask_length,
                mask_channel_prob=cfg.masking.mask_channel_prob,
                mask_channel_length=cfg.masking.mask_channel_length,
            )
        if cfg.use_conv_pos:
            x = x + jax.nn.gelu(self.pos_conv(x), approximate=False)
        return x, valid, frame_lengths, time_mask, features_pen

    def convert_embeddings(self, x, valid, targets=None, time_mask=None, *,
                           mix: bool, deterministic: bool):
        """Embedding mixing (reference speechlm.py:392-462): swap a random
        subset of unmasked positions with unit embeddings of the targets."""
        cfg = self.cfg
        l2_loss = jnp.zeros(())
        if cfg.l2_embedding and targets is not None:
            ue = self.unit_embed_tokens(targets).astype(jnp.float32)
            m = (time_mask if time_mask is not None else valid).astype(jnp.float32)
            diff = (x.astype(jnp.float32) - ue) ** 2
            num = (diff.mean(-1) * m).sum()
            scale = jnp.maximum(((ue ** 2).sum(-1) * m).sum(), 1e-6)
            l2_loss = num / scale
        if mix and targets is not None:
            lengths = valid.astype(jnp.int32).sum(-1)
            sel = compute_span_mask(
                self.make_rng("mix"), lengths, x.shape[1],
                cfg.masking.mask_prob / 2, max(cfg.masking.mask_length // 2, 1),
            )
            if time_mask is not None:
                sel = sel & (~time_mask)
            ue = self.unit_embed_tokens(targets).astype(x.dtype)
            x = jnp.where(sel[:, :, None], ue, x)
        x = x * valid[:, :, None].astype(x.dtype)
        return x, l2_loss

    # --------------------------------------------------------------- branches

    def forward_speech(self, wav, wav_lengths, targets=None, *, mask=True,
                       deterministic=True):
        """Speech pretraining branch.  targets: [B, T] km units or None."""
        cfg = self.cfg
        x, valid, frame_lengths, time_mask, features_pen = self._front(
            wav, wav_lengths, mask=mask, deterministic=deterministic
        )
        enc = self.encoder(x, valid, deterministic=deterministic)
        h = enc["encoder_out"]
        out = {
            "features_pen": features_pen,
            "valid_mask": valid,
            "time_mask": time_mask,
            "speech_out": h,
        }
        if targets is not None:
            out["logits_0"] = self._cosine_logits(
                self.final_proj_0(h.astype(jnp.float32)), self.label_embs_0
            )
        mixed, l2_loss = self.convert_embeddings(
            h, valid, targets, time_mask,
            mix=cfg.mix_with_unit and targets is not None,
            deterministic=deterministic,
        )
        uenc = self.unit_encoder(mixed, valid, deterministic=deterministic)
        out["encoder_out"] = uenc["encoder_out"]
        out["l2_loss"] = l2_loss
        if targets is not None:
            out["logits_1"] = self._cosine_logits(
                self.final_proj_1(uenc["encoder_out"].astype(jnp.float32)),
                self.label_embs_1,
            )
        return out

    def forward_text(self, unit_tokens, *, mask=True, deterministic=True):
        """Unit/text branch: masked-unit LM + char CTC over the unit encoder."""
        cfg = self.cfg
        valid = unit_tokens != cfg.pad_id
        x = self.unit_embed_tokens(unit_tokens).astype(self.cfg.compute_dtype)
        time_mask = None
        if mask and cfg.masking.mask_prob > 0:
            lengths = valid.astype(jnp.int32).sum(-1)
            x, time_mask = apply_feature_masks(
                self.make_rng("mask"), x, lengths, self.mask_emb,
                mask_prob=cfg.masking.mask_prob,
                mask_length=cfg.masking.mask_length,
            )
        enc = self.unit_encoder(x, valid, deterministic=deterministic)
        out = {"encoder_out": enc["encoder_out"], "valid_mask": valid,
               "time_mask": time_mask}
        if cfg.compute_mum:
            out["mum_logits"] = self._cosine_logits(
                self.final_proj_1(enc["encoder_out"].astype(jnp.float32)),
                self.label_embs_1,
            )
        if cfg.add_text_ctc:
            out["ctc_logits"] = self.unit_encoder_ctc_head(
                enc["encoder_out"].astype(jnp.float32)
            )
        return out

    def extract_features(self, wav, wav_lengths, *, deterministic=True):
        """Fine-tune / SUPERB surface (reference SpeechLM.py top-level module):
        full stack without masking."""
        x, valid, frame_lengths, _, _ = self._front(
            wav, wav_lengths, mask=False, deterministic=deterministic
        )
        enc = self.encoder(x, valid, deterministic=deterministic)
        mixed, _ = self.convert_embeddings(
            enc["encoder_out"], valid, None, None, mix=False,
            deterministic=deterministic,
        )
        uenc = self.unit_encoder(mixed, valid, deterministic=deterministic)
        return uenc["encoder_out"], valid


class SpeechLMCtc(nn.Module):
    """CTC ASR fine-tune head (reference models/speechlm_ctcasr.py:22-56)."""

    cfg: SpeechLMConfig
    ctc_vocab_size: int = 32

    def setup(self):
        self.speechlm = SpeechLMModel(self.cfg)
        self.ctc_proj = nn.Dense(self.ctc_vocab_size, dtype=jnp.float32)
        self.drop = nn.Dropout(0.1)

    def __call__(self, wav, wav_lengths, *, deterministic=True):
        h, valid = self.speechlm.extract_features(
            wav, wav_lengths, deterministic=deterministic
        )
        h = self.drop(h, deterministic=deterministic)
        return self.ctc_proj(h.astype(jnp.float32)), valid


class SpeechLMS2T(nn.Module):
    """Seq2seq ST fine-tune (reference models/speechlm_st.py:93-268)."""

    cfg: SpeechLMConfig
    decoder_cfg: TransformerConfig
    tgt_vocab_size: int = 1000

    def setup(self):
        self.speechlm = SpeechLMModel(self.cfg)
        self.decoder = TransformerDecoder(self.decoder_cfg)
        self.embed_tokens = nn.Embed(
            self.tgt_vocab_size, self.decoder_cfg.d_model, param_dtype=jnp.float32
        )
        self.output_projection = nn.Dense(
            self.tgt_vocab_size, use_bias=False, dtype=jnp.float32
        )

    def __call__(self, wav, wav_lengths, prev_tokens, *, deterministic=True):
        h, valid = self.speechlm.extract_features(
            wav, wav_lengths, deterministic=deterministic
        )
        from ..ops.positional import fairseq_sinusoidal

        self_valid = prev_tokens != self.cfg.pad_id
        x = self.embed_tokens(prev_tokens).astype(h.dtype)
        x = x + fairseq_sinusoidal(
            self_valid, self.decoder_cfg.d_model, self.cfg.pad_id
        ).astype(x.dtype)
        feats, _ = self.decoder(
            x, h, enc_valid=valid, self_valid=self_valid,
            deterministic=deterministic,
        )
        return self.output_projection(feats.astype(jnp.float32)), valid
