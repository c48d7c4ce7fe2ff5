"""VATLM: visual-audio-text pre-training (AV-HuBERT-style masked prediction).

Behavioral spec from reference VATLM/vat_hubert/vathubert/models/vathubert.py:338-850
and models/resnet.py:
- per-modality frontends: audio = linear proj of stacked log-fbank features
  (audio_feat_dim, :354-356 SubModel with resnet=None); video = 3D conv +
  ResNet trunk + spatial pooling (:352-353, resnet.py ResEncoder); phone/text
  = embedding + Conv1d (:414-424 phone_embed/phone_conv), zero-padded or
  truncated to the audio/video length (:650-657);
- train-time modality dropout: drop ALL audio (or video) features with
  configured probabilities (:674-680);
- fusion: channel concat [audio, video, phone] (embed = 3*d) or add, then
  LayerNorm + projection to d_model (:682-686, :359-367);
- HuBERT feature masking + transformer encoder + cosine-similarity NCE
  against label embeddings (:700-760);
- fine-tune: encoder features + seq2seq decoder (vathubert_asr.py, infer_s2s).

TPU-first: all masks/dropout via jax PRNG; the video ResNet is a
(width-parameterizable) flax trunk with BatchNorm batch_stats; everything
static-shape so the tri-modal forward jits whole.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace as dc_replace
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig, MaskingConfig, RelPosConfig
from ..ops.masking import apply_feature_masks
from ..ops.positional import fairseq_sinusoidal, fairseq_sinusoidal_table
from ..utils.masks import length_mask
from ..ops.heads import cosine_logits
from .encoder import TransformerEncoder
from .decoder import TransformerDecoder


@dataclass(frozen=True)
class VATLMConfig:
    encoder: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(num_layers=12)
    )
    decoder: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(
            num_layers=6, use_rel_pos_bias=False
        )
    )
    masking: MaskingConfig = field(
        default_factory=lambda: MaskingConfig(mask_prob=0.8, mask_length=10)
    )
    audio_feat_dim: int = 104        # 26-dim fbank x 4-frame stacking
    video_size: int = 88             # input crop (square)
    resnet_widths: Tuple[int, ...] = (64, 128, 256, 512)
    resnet_blocks: int = 2           # BasicBlocks per stage (ResNet-18)
    num_classes: Tuple[int, ...] = (1000,)   # km label-set sizes
    phone_vocab_size: int = 0        # 0 = no phone branch
    phone_conv_kernel: int = 3
    vocab_size: int = 1000           # text vocab for the ASR fine-tune
    pad_id: int = 1
    eos_id: int = 2
    blank_id: int = 4
    final_dim: int = 256
    logit_temp: float = 0.1
    untie_final_proj: bool = True
    modality_fuse: str = "concat"    # concat | add
    modality_dropout: float = 0.0
    audio_dropout: float = 0.0
    max_text_positions: int = 1024
    dtype: str = "float32"

    @property
    def d_model(self):
        return self.encoder.d_model

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def vatlm_tiny(**kw) -> VATLMConfig:
    enc = TransformerConfig(
        d_model=64, ffn_dim=128, num_layers=2, num_heads=4,
        dropout=0.0, attention_dropout=0.0,
        rel_pos=RelPosConfig(max_distance=16),
    )
    cfg = VATLMConfig(
        encoder=enc, decoder=dc_replace(enc, use_rel_pos_bias=False),
        audio_feat_dim=26, video_size=16, resnet_widths=(8, 16),
        resnet_blocks=1, num_classes=(20,), phone_vocab_size=30,
        vocab_size=40, final_dim=16, max_text_positions=64,
    )
    return dc_replace(cfg, **kw)


class BasicBlock(nn.Module):
    """ResNet BasicBlock (reference resnet.py): conv-BN-relu-conv-BN +
    (projected) residual."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn1")(y).astype(self.dtype)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn2")(y).astype(self.dtype)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample",
            )(residual)
        return jax.nn.relu(y + residual)


class VideoFrontend(nn.Module):
    """3D-conv stem + ResNet trunk + spatial mean pool
    (reference resnet.py ResEncoder: conv3d(5,7,7)/(1,2,2) + maxpool +
    BasicBlock stages)."""

    cfg: VATLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video, train: bool = False):
        """video: [B, T, H, W, 1] -> [B, T, widths[-1]]."""
        cfg = self.cfg
        x = nn.Conv(cfg.resnet_widths[0], (5, 7, 7), strides=(1, 2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="stem3d")(video.astype(self.dtype))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="stem_bn")(x).astype(self.dtype)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        B, T = x.shape[:2]
        x = x.reshape((B * T,) + x.shape[2:])  # per-frame 2D trunk
        for s, w in enumerate(cfg.resnet_widths):
            for b in range(cfg.resnet_blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                x = BasicBlock(w, stride, self.dtype,
                               name=f"stage{s}_block{b}")(x, train)
        x = x.mean(axis=(1, 2))                # spatial average pool
        return x.reshape(B, T, -1)


class VATLMModel(nn.Module):
    cfg: VATLMConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.audio_proj = nn.Dense(cfg.d_model, dtype=dt, name="audio_proj")
        self.video_frontend = VideoFrontend(cfg, dt, name="video_frontend")
        self.video_proj = nn.Dense(cfg.d_model, dtype=dt, name="video_proj")
        if cfg.phone_vocab_size:
            self.phone_embed = nn.Embed(
                cfg.phone_vocab_size, cfg.d_model, name="phone_embed"
            )
            self.phone_conv = nn.Conv(
                cfg.d_model, (cfg.phone_conv_kernel,), padding="SAME",
                dtype=dt, name="phone_conv",
            )
        embed = cfg.d_model * 3 if cfg.modality_fuse == "concat" else cfg.d_model
        self.fuse_norm = nn.LayerNorm(dtype=jnp.float32, name="fuse_norm")
        if embed != cfg.d_model:
            self.post_extract_proj = nn.Dense(
                cfg.d_model, dtype=dt, name="post_extract_proj"
            )
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(1.0), (cfg.d_model,),
            jnp.float32,
        )
        self.encoder = TransformerEncoder(cfg.encoder, dtype=dt)
        out = cfg.final_dim * (
            len(cfg.num_classes) if cfg.untie_final_proj else 1
        )
        self.final_proj = nn.Dense(out, dtype=jnp.float32, name="final_proj")
        self.label_embs_concat = self.param(
            "label_embs_concat", nn.initializers.uniform(1.0),
            (sum(cfg.num_classes), cfg.final_dim), jnp.float32,
        )
        # ASR fine-tune surface (vathubert_asr.py seq2seq)
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.d_model, name="embed_tokens"
        )
        self.decoder = TransformerDecoder(cfg.decoder, dtype=dt)

    def init_all(self, audio, video, lengths, phones, prev_tokens):
        out = self.forward_pretrain(
            audio, video, lengths, phone_tokens=phones, mask=True,
            deterministic=True,
        )
        _ = self.decode_text(out["enc"], prev_tokens)
        return out["logits"][0]

    # ----------------------------------------------------------- frontends

    def _phone_features(self, phone_tokens, T: int):
        x = self.phone_embed(phone_tokens).astype(self.cfg.compute_dtype)
        x = self.phone_conv(x)
        Tp = x.shape[1]
        if Tp >= T:
            return x[:, :T]
        return jnp.pad(x, ((0, 0), (0, T - Tp), (0, 0)))

    def fuse_features(self, audio=None, video=None, lengths=None,
                      phone_tokens=None, *, deterministic=True):
        """Per-modality features -> fused [B, T, D] + valid mask.  Missing
        modalities become zeros (reference :625-647); train-time modality
        dropout zeroes audio or video entirely (:674-680)."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        if audio is not None:
            T = audio.shape[1]
            B = audio.shape[0]
        elif video is not None:
            T = video.shape[1]
            B = video.shape[0]
        else:
            T = phone_tokens.shape[1]
            B = phone_tokens.shape[0]

        fa = (self.audio_proj(audio.astype(dt)) if audio is not None
              else jnp.zeros((B, T, cfg.d_model), dt))
        fv = (self.video_proj(
                  self.video_frontend(video, train=not deterministic))
              if video is not None else jnp.zeros((B, T, cfg.d_model), dt))
        fp = (self._phone_features(phone_tokens, T)
              if (cfg.phone_vocab_size and phone_tokens is not None)
              else jnp.zeros((B, T, cfg.d_model), dt))

        if not deterministic and cfg.modality_dropout > 0:
            r1, r2 = jax.random.split(self.make_rng("modality"))
            drop = jax.random.uniform(r1) < cfg.modality_dropout
            drop_audio = jax.random.uniform(r2) < cfg.audio_dropout
            fa = jnp.where(drop & drop_audio, 0.0, fa)
            fv = jnp.where(drop & ~drop_audio, 0.0, fv)

        if cfg.modality_fuse == "concat":
            fused = jnp.concatenate([fa, fv, fp], axis=-1)
        else:
            fused = fa + fv + fp
        fused = self.fuse_norm(fused).astype(dt)
        if hasattr(self, "post_extract_proj"):
            fused = self.post_extract_proj(fused)
        valid = (length_mask(lengths, T) if lengths is not None
                 else jnp.ones((B, T), bool))
        return fused, valid

    # ------------------------------------------------------------- pretrain

    def forward_pretrain(self, audio=None, video=None, lengths=None, *,
                         phone_tokens=None, mask=True, deterministic=False):
        cfg = self.cfg
        x, valid = self.fuse_features(
            audio, video, lengths, phone_tokens, deterministic=deterministic
        )
        time_mask = None
        if mask and cfg.masking.mask_prob > 0:
            frame_lengths = valid.astype(jnp.int32).sum(-1)
            x, time_mask = apply_feature_masks(
                self.make_rng("mask"), x, frame_lengths, self.mask_emb,
                mask_prob=cfg.masking.mask_prob,
                mask_length=cfg.masking.mask_length,
            )
        enc = self.encoder(x, valid, deterministic=deterministic)
        proj = self.final_proj(enc["encoder_out"].astype(jnp.float32))
        if cfg.untie_final_proj:
            projs = jnp.split(proj, len(cfg.num_classes), axis=-1)
        else:
            projs = [proj] * len(cfg.num_classes)
        logits = []
        off = 0
        for i, c in enumerate(cfg.num_classes):
            embs = self.label_embs_concat[off : off + c]
            off += c
            logits.append(cosine_logits(projs[i], embs, cfg.logit_temp))
        return {"logits": logits, "time_mask": time_mask,
                "valid_mask": valid, "enc": enc}

    # ------------------------------------------------------- ASR fine-tune

    def encode_av(self, audio=None, video=None, lengths=None, *,
                  deterministic=True):
        x, valid = self.fuse_features(
            audio, video, lengths, deterministic=deterministic
        )
        return self.encoder(x, valid, deterministic=deterministic)

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

    def forward_asr(self, audio, video, lengths, prev_tokens, *,
                    deterministic=False):
        enc = self.encode_av(
            audio, video, lengths, deterministic=deterministic
        )
        logits = self.decode_text(enc, prev_tokens, deterministic=deterministic)
        return logits, enc["valid_mask"]

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
            x, cache, enc_valid=enc_valid, cache_rows=cache_rows
        )
        logits = feats.astype(jnp.float32) @ self.embed_tokens.embedding.T.astype(
            jnp.float32
        )
        return logits[:, 0], new_cache
