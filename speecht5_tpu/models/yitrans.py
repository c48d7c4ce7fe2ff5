"""YiTrans: two-stage joint speech/text encoder-decoder pretraining for ST.

Behavioral spec from reference YiTrans/yitrans_iwslt22/models/:
- pretrain_ed.py:200 (stage 1) / pretrain_ed_step2.py:124 (stage 2): HuBERT-style
  speech encoder + text (mBART-style) embedding front sharing one encoder, with
  a multimodal transformer decoder (modules/multimodal_transformer_decoder.py)
  trained with masked speech prediction + text denoising;
- fine-tunes: finetune_asr.py:115 (joint CTC+CE ASR), finetune_mt.py:89 (MT),
  finetune_st.py:85 (ST) — all encoder-decoder with language-id tokens.

Built on the shared substrate; exposes encode_speech/encode_text +
decode_text/text_decode_step so the jitted ASRDecoder handles ASR/MT/ST beam
decode for all three fine-tunes.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace as dc_replace

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig, ConvFeatureConfig, MaskingConfig, RelPosConfig
from ..ops.masking import apply_feature_masks
from ..ops.positional import fairseq_sinusoidal, fairseq_sinusoidal_table
from ..utils.masks import length_mask
from ..ops.heads import cosine_logits
from .prenets import ConvFeatureExtractor, WeightNormConv1d
from .encoder import TransformerEncoder
from .decoder import TransformerDecoder


@dataclass(frozen=True)
class YiTransConfig:
    encoder: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(num_layers=12)
    )
    decoder: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(num_layers=12, use_rel_pos_bias=False)
    )
    conv_features: ConvFeatureConfig = field(default_factory=ConvFeatureConfig)
    masking: MaskingConfig = field(default_factory=MaskingConfig)
    vocab_size: int = 32000        # multilingual BPE
    unit_vocab_size: int = 504     # km units for masked speech prediction
    pad_id: int = 1
    eos_id: int = 2
    blank_id: int = 4
    final_dim: int = 256
    logit_temp: float = 0.1
    use_conv_pos: bool = True
    conv_pos: int = 128
    conv_pos_groups: int = 16
    max_text_positions: int = 1024
    dtype: str = "float32"

    @property
    def d_model(self):
        return self.encoder.d_model

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def yitrans_tiny(**kw) -> YiTransConfig:
    enc = TransformerConfig(
        d_model=64, ffn_dim=128, num_layers=2, num_heads=4,
        dropout=0.0, attention_dropout=0.0, rel_pos=RelPosConfig(max_distance=16),
    )
    cfg = YiTransConfig(
        encoder=enc, decoder=dc_replace(enc, use_rel_pos_bias=False),
        conv_features=ConvFeatureConfig(layers=((32, 10, 5), (32, 8, 4), (64, 4, 4))),
        vocab_size=64, unit_vocab_size=24, final_dim=16,
        conv_pos=16, conv_pos_groups=4, max_text_positions=64,
    )
    return dc_replace(cfg, **kw)


class YiTransModel(nn.Module):
    cfg: YiTransConfig

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
        self.encoder = TransformerEncoder(
            cfg.encoder, ctc_vocab_size=cfg.vocab_size, dtype=dt
        )
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.d_model, param_dtype=jnp.float32
        )
        self.decoder = TransformerDecoder(cfg.decoder, dtype=dt)
        # masked speech prediction head (units)
        self.final_proj = nn.Dense(cfg.final_dim, dtype=jnp.float32)
        self.label_embs = self.param(
            "label_embs", nn.initializers.uniform(1.0),
            (cfg.unit_vocab_size, cfg.final_dim), jnp.float32,
        )

    def init_all(self, wav, wav_lengths, tokens, prev_tokens):
        enc = self.encode_speech(wav, wav_lengths, mask=True, with_ctc=True)
        _ = self.hubert_logits(enc)
        _ = self.decode_text(enc, prev_tokens)
        enc_t = self.encode_text(tokens)
        _ = self.decode_text(enc_t, prev_tokens)
        return enc["encoder_out"]

    # -------------------------------------------------------------- encoders

    def encode_speech(self, wav, wav_lengths, *, mask=False, deterministic=True,
                      with_ctc=False):
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
        enc = self.encoder(x, valid, deterministic=deterministic,
                           with_ctc=with_ctc)
        enc["time_mask"] = time_mask
        enc["features_pen"] = features_pen
        return enc

    def encode_text(self, tokens, *, deterministic=True):
        cfg = self.cfg
        valid = tokens != cfg.pad_id
        x = self.embed_tokens(tokens).astype(cfg.compute_dtype)
        x = x + fairseq_sinusoidal(valid, cfg.d_model, cfg.pad_id).astype(x.dtype)
        return self.encoder(x, valid, deterministic=deterministic)

    def hubert_logits(self, enc):
        proj = self.final_proj(enc["encoder_out"].astype(jnp.float32))
        return cosine_logits(proj, self.label_embs, self.cfg.logit_temp)

    # --------------------------------------------------------------- decoder

    def _embed_prev(self, tokens):
        cfg = self.cfg
        valid = tokens != cfg.pad_id
        x = self.embed_tokens(tokens).astype(cfg.compute_dtype)
        x = x + fairseq_sinusoidal(valid, cfg.d_model, cfg.pad_id).astype(x.dtype)
        return x, valid

    def decode_text(self, enc, prev_tokens, *, deterministic=True):
        x, self_valid = self._embed_prev(prev_tokens)
        feats, _ = self.decoder(
            x, enc["encoder_out"], enc_valid=enc["valid_mask"],
            self_valid=self_valid, deterministic=deterministic,
        )
        return feats.astype(jnp.float32) @ self.embed_tokens.embedding.T.astype(
            jnp.float32
        )

    def init_text_cache(self, enc, batch_size: int, max_len: int):
        return self.decoder.init_cache(enc["encoder_out"], batch_size, max_len)

    def text_decode_step(self, tokens_t, cache, *, enc_valid=None,
                         cache_rows=None):
        cfg = self.cfg
        x = self.embed_tokens(tokens_t).astype(cfg.compute_dtype)
        table = jnp.asarray(fairseq_sinusoidal_table(
            cfg.pad_id + 2 + cfg.max_text_positions, cfg.d_model, cfg.pad_id
        ))
        x = x + table[cfg.pad_id + 1 + cache["index"]][None, None, :].astype(x.dtype)
        feats, new_cache, _ = self.decoder.decode_step(
            x, cache, enc_valid=enc_valid, cache_rows=cache_rows)
        logits = feats.astype(jnp.float32) @ self.embed_tokens.embedding.T.astype(
            jnp.float32
        )
        return logits[:, 0], new_cache

    # -------------------------------------------------------- task forwards

    def forward_asr(self, wav, wav_lengths, prev_tokens, *, mask=True,
                    deterministic=False):
        enc = self.encode_speech(
            wav, wav_lengths, mask=mask, deterministic=deterministic, with_ctc=True
        )
        logits = self.decode_text(enc, prev_tokens, deterministic=deterministic)
        return logits, enc["ctc_logits"], enc["valid_mask"]

    def forward_st(self, wav, wav_lengths, prev_tokens, *, mask=False,
                   deterministic=False):
        enc = self.encode_speech(
            wav, wav_lengths, mask=mask, deterministic=deterministic
        )
        return self.decode_text(enc, prev_tokens, deterministic=deterministic)

    def forward_mt(self, src_tokens, prev_tokens, *, deterministic=False):
        enc = self.encode_text(src_tokens, deterministic=deterministic)
        return self.decode_text(enc, prev_tokens, deterministic=deterministic)

    def forward_pretrain(self, wav, wav_lengths, noised_tokens, prev_tokens, *,
                         deterministic=False):
        """Stage-1 joint pretraining: masked speech prediction + text denoising."""
        enc_s = self.encode_speech(
            wav, wav_lengths, mask=True, deterministic=deterministic
        )
        speech_logits = self.hubert_logits(enc_s)
        enc_t = self.encode_text(noised_tokens, deterministic=deterministic)
        text_logits = self.decode_text(enc_t, prev_tokens,
                                       deterministic=deterministic)
        return {
            "speech_logits": speech_logits,
            "time_mask": enc_s["time_mask"],
            "valid_mask": enc_s["valid_mask"],
            "features_pen": enc_s["features_pen"],
            "text_logits": text_logits,
        }
