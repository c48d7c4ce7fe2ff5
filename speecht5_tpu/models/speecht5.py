"""Unified-modal SpeechT5 encoder-decoder.

Behavioral spec from reference models/speecht5.py:47-1447 (T5TransformerModel):
9 sub-nets around a shared encoder/decoder, routed by input/output modality:

  speech in : SpeechEncoderPrenet (conv FE + HuBERT masking)   -> encoder
  text   in : TextEncoderPrenet   (embed + scaled pos)         -> encoder
  text  out : TextDecoderPrenet -> decoder -> TextDecoderPostnet
  speech out: SpeechDecoderPrenet -> decoder -> SpeechDecoderPostnet
  + SpeechEncoderPostnet (HuBERT head), SpeakerDecoderPostnet (SID),
    GumbelVectorQuantizer codebook mixing (speecht5.py:858-882).

This class exposes explicit per-task forwards (pure functions of params) instead
of the reference's single kwargs-dispatched ``forward``; decode paths use
functional KV caches so the AR loops jit as lax.while_loop/scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SpeechT5Config
from .encoder import TransformerEncoder
from .decoder import TransformerDecoder
from .prenets import (
    SpeechEncoderPrenet,
    TextEncoderPrenet,
    TextDecoderPrenet,
    SpeechDecoderPrenet,
)
from .postnets import (
    SpeechDecoderPostnet,
    TextDecoderPostnet,
    SpeechEncoderPostnet,
    SpeakerDecoderPostnet,
)
from .quantizer import GumbelVectorQuantizer


def init_model(cfg: SpeechT5Config, rng, wav_len: int = 2000):
    """Create a SpeechT5Model and initialize ALL parameters in one pass."""
    model = SpeechT5Model(cfg)
    B = 1
    wav = jnp.zeros((B, wav_len))
    wav_lengths = jnp.full((B,), wav_len, jnp.int32)
    tokens = jnp.full((B, 4), cfg.eos_id, jnp.int32)
    prev_tokens = jnp.full((B, 4), cfg.eos_id, jnp.int32)
    prev_mel = jnp.zeros((B, 2, cfg.n_mels))
    tgt_lengths = jnp.full((B,), 2, jnp.int32)
    spkembs = (
        jnp.zeros((B, cfg.spk_embed_dim)) if cfg.spk_embed_dim is not None else None
    )
    rngs = {"params": rng, "mask": rng, "codebook": rng, "gumbel": rng}
    # jit the init: eager flax init dispatches thousands of tiny ops, which is
    # pathological on remote-device backends
    init_fn = jax.jit(
        lambda: model.init(
            rngs, wav, wav_lengths, tokens, prev_tokens, prev_mel, tgt_lengths,
            spkembs, method="init_all",
        )
    )
    return model, init_fn()


class SpeechT5Model(nn.Module):
    cfg: SpeechT5Config

    def setup(self):
        cfg = self.cfg
        dt, pt = cfg.compute_dtype, jnp.float32

        self.speech_encoder_prenet = SpeechEncoderPrenet(cfg, dt, pt)
        self.text_encoder_prenet = TextEncoderPrenet(cfg, dt, pt)
        self.encoder = TransformerEncoder(
            cfg.encoder, ctc_vocab_size=cfg.vocab_size, dtype=dt, param_dtype=pt
        )
        self.decoder = TransformerDecoder(cfg.decoder, dtype=dt, param_dtype=pt)
        self.text_decoder_prenet = TextDecoderPrenet(cfg, dt, pt)
        self.text_decoder_postnet = TextDecoderPostnet(cfg, dt, pt)
        self.speech_decoder_prenet = SpeechDecoderPrenet(cfg, dt, pt)
        self.speech_decoder_postnet = SpeechDecoderPostnet(cfg, dt, pt)
        self.speech_encoder_postnet = SpeechEncoderPostnet(cfg, dt, pt)
        if cfg.sid.num_classes > 0:
            s = cfg.sid
            self.speaker_decoder_postnet = SpeakerDecoderPostnet(
                embed_dim=s.embed_dim, class_num=s.num_classes,
                softmax_type=s.softmax_type, margin=s.margin, scale=s.scale,
                easy_margin=s.easy_margin, no_pooling_bn=s.no_pooling_bn,
                no_embed_postnet=s.no_embed_postnet,
                normalize_postnet=s.normalize_postnet,
                dtype=dt, param_dtype=pt,
            )
        if cfg.spk_embed_dim is not None and cfg.spk_embed_integration != "pre":
            # model-level x-vector integration into the ENCODER output
            # (reference speecht5.py:84-90, _integrate_with_spk_embed
            # :1001-1020); 'pre' instead concats inside the speech decoder
            # prenet (prenets.py)
            self.spkembs_projection = nn.Dense(
                cfg.d_model, dtype=cfg.compute_dtype, param_dtype=jnp.float32,
                name="spkembs_projection",
            )
        if cfg.quantizer.enabled:
            vq_dim = cfg.quantizer.latent_dim or cfg.d_model
            self.quantizer = GumbelVectorQuantizer(
                dim=cfg.d_model,
                num_vars=cfg.quantizer.latent_vars,
                groups=cfg.quantizer.latent_groups,
                vq_dim=vq_dim,
                temp=(
                    cfg.quantizer.temp_start,
                    cfg.quantizer.temp_end,
                    cfg.quantizer.temp_decay,
                ),
                dtype=dt, param_dtype=pt,
            )

    # ------------------------------------------------------------------- init

    def init_all(self, wav, wav_lengths, tokens, prev_tokens, prev_mel,
                 tgt_lengths, spkembs):
        """Touch every submodule once so a single ``init`` creates all params
        (linen setup is lazy; individual task forwards only create their slice)."""
        enc = self.encode_speech(wav, wav_lengths, mask=True, with_ctc=True)
        _ = self.hubert_logits(enc)
        if self.cfg.sid.num_classes > 0:
            _ = self._sid_head(enc)
        if self.cfg.quantizer.enabled:
            enc, _ = self.apply_codebook(enc)
        _ = self.decode_text(enc, prev_tokens)
        _ = self.decode_speech(enc, prev_mel, tgt_lengths, spkembs)
        enc_t = self.encode_text(tokens)
        return enc_t["encoder_out"]

    # ------------------------------------------------------------------ encode

    def encode_speech(self, wav, wav_lengths, *, mask=False, deterministic=True,
                      with_ctc=False, prepend_cls=False, shuffle=False):
        x, valid, time_mask, feat_pen = self.speech_encoder_prenet(
            wav, wav_lengths, mask=mask, deterministic=deterministic
        )
        if shuffle:
            # SID train-time augmentation: one time permutation shared across
            # the batch (reference speecht5.py:821-825).  The raw permutation
            # scatters right-padding into the interior; the fused attention
            # kernels (use_pallas_attn*) assume a contiguous prefix mask, so
            # stably compact valid frames to the front — frame order stays
            # randomly permuted, padding returns to the right edge.
            perm = jax.random.permutation(self.make_rng("dropout"), x.shape[1])
            x, valid = x[:, perm], valid[:, perm]
            order = jnp.argsort(~valid, axis=1, stable=True)  # valid first
            x = jnp.take_along_axis(x, order[:, :, None], axis=1)
            valid = jnp.take_along_axis(valid, order, axis=1)
        if prepend_cls:
            # [CLS] = zero token through the text decoder prenet, prepended
            # with a cleared mask slot (reference speecht5.py:826-828,
            # _integrate_with_speaker_cls :965-990)
            cls_tok = jnp.zeros((x.shape[0], 1), jnp.int32)
            cls_vec, _ = self.text_decoder_prenet(cls_tok, deterministic=True)
            x = jnp.concatenate([cls_vec.astype(x.dtype), x], axis=1)
            valid = jnp.concatenate(
                [jnp.ones((x.shape[0], 1), bool), valid], axis=1
            )
        enc = self.encoder(
            x, valid, deterministic=deterministic, with_ctc=with_ctc
        )
        enc["time_mask"] = time_mask
        enc["features_pen"] = feat_pen
        return enc

    def encode_text(self, tokens, *, deterministic=True):
        x, valid = self.text_encoder_prenet(tokens, deterministic=deterministic)
        return self.encoder(x, valid, deterministic=deterministic)

    # ---------------------------------------------------------- text decoding

    def decode_text(self, enc, prev_tokens, *, deterministic=True):
        """Teacher-forced text decode -> logits [B, T, V]."""
        x, self_valid = self.text_decoder_prenet(
            prev_tokens, deterministic=deterministic
        )
        feats, _ = self.decoder(
            x,
            enc["encoder_out"],
            enc_valid=enc["valid_mask"],
            self_valid=self_valid,
            deterministic=deterministic,
        )
        return self._text_logits(feats)

    def _text_logits(self, feats):
        emb = (
            self.text_decoder_prenet.embed_tokens.embedding
            if self.cfg.share_input_output_embed
            else None
        )
        return self.text_decoder_postnet(feats, emb)

    def init_text_cache(self, enc, batch_size: int, max_len: int):
        return self.decoder.init_cache(enc["encoder_out"], batch_size, max_len)

    def text_decode_step(self, tokens_t, cache, *, enc_valid=None,
                         cache_rows=None):
        """tokens_t: [B, 1] -> (logits [B, V], new_cache)."""
        x = self.text_decoder_prenet.step(tokens_t, cache["index"])
        feats, new_cache, _ = self.decoder.decode_step(
            x, cache, enc_valid=enc_valid, cache_rows=cache_rows
        )
        return self._text_logits(feats)[:, 0], new_cache

    # --------------------------------------------------------- speech decoding

    def decode_speech(
        self,
        enc,
        prev_mel,                # [B, T_r, n_mels] r-thinned, zero BOS frame
        tgt_lengths=None,
        spkembs=None,
        *,
        deterministic=True,
        need_attn=False,
    ):
        """Teacher-forced mel decode -> (before, after, stop_logits, cross_attn)."""
        enc = self.integrate_spk_embed(enc, spkembs)
        x, self_valid = self.speech_decoder_prenet(
            prev_mel, tgt_lengths, spkembs, deterministic=deterministic
        )
        feats, cross = self.decoder(
            x,
            enc["encoder_out"],
            enc_valid=enc["valid_mask"],
            self_valid=self_valid,
            deterministic=deterministic,
            alignment_layer=-1 if need_attn else None,
        )
        before, after, stop_logits = self.speech_decoder_postnet(
            feats, deterministic=deterministic
        )
        return before, after, stop_logits, cross

    def integrate_spk_embed(self, enc, spkembs):
        """Model-level x-vector integration into the encoder output for
        spk_embed_integration 'add' | 'concat' (reference speecht5.py:895-908
        call site, :1001-1020 math: L2-normalize the x-vector, then either
        project-and-add or concat-and-project).  No-op for 'pre' (handled by
        the speech decoder prenet) or when no x-vector is given."""
        cfg = self.cfg
        if spkembs is None or cfg.spk_embed_dim is None \
                or cfg.spk_embed_integration == "pre":
            return enc
        hs = enc["encoder_out"]
        s = spkembs / jnp.maximum(
            jnp.linalg.norm(spkembs, axis=-1, keepdims=True), 1e-12
        )
        s = s.astype(hs.dtype)
        if cfg.spk_embed_integration == "add":
            hs = hs + self.spkembs_projection(s)[:, None, :]
        else:  # concat
            s = jnp.broadcast_to(s[:, None, :], hs.shape[:2] + (s.shape[-1],))
            hs = self.spkembs_projection(jnp.concatenate([hs, s], axis=-1))
        enc = dict(enc)
        enc["encoder_out"] = hs
        return enc

    def init_speech_cache(self, enc, batch_size: int, max_len: int,
                          spkembs=None):
        enc = self.integrate_spk_embed(enc, spkembs)
        return self.decoder.init_cache(enc["encoder_out"], batch_size, max_len)

    def speech_decode_step(self, prev_frame, cache, *, spkembs=None,
                           enc_valid=None, need_attn=False):
        """One AR mel step.  prev_frame: [B, 1, n_mels] (last output frame).

        Returns (frames [B, r, n_mels], stop_probs [B, r], new_cache, attn)
        where attn is per-layer cross weights [L, B, H, Tsrc] (for the focus
        rate, reference scripts/generate_speech.py:54-66) or None.

        Unlike the reference loop (speecht5.py:1222-1245) which reruns the prenet
        over the whole history every step (O(T^2)), the prenet here is causal
        per-frame so only the new frame is processed.
        """
        x, _ = self.speech_decoder_prenet(
            prev_frame, None, spkembs, position_offset=cache["index"],
        )
        feats, new_cache, cross_w = self.decoder.decode_step(
            x, cache, enc_valid=enc_valid, need_cross_weights=need_attn
        )
        frames = self.speech_decoder_postnet.project_frames(feats)
        probs = self.speech_decoder_postnet.stop_probs(feats)
        attn = cross_w[:, :, :, 0] if cross_w is not None else None
        return frames, probs, new_cache, attn

    def postnet_refine(self, mel, deterministic=True):
        return self.speech_decoder_postnet.refine(mel, deterministic)

    # ------------------------------------------------------------- task heads

    def ctc_logits(self, enc):
        return self.encoder.ctc_head(enc["encoder_out"])

    def hubert_logits(self, enc):
        return self.speech_encoder_postnet(enc["encoder_out"])

    def apply_codebook(self, enc, *, num_updates=0, deterministic=True):
        """Codebook mixing (reference speecht5.py:858-882): replace a random
        subset of time positions (same for every batch element, matching the
        reference's randperm over time) with quantized codes."""
        cfg = self.cfg.quantizer
        q = self.quantizer(
            enc["encoder_out"], num_updates=num_updates, deterministic=deterministic
        )
        T = q["x"].shape[1]
        n_replace = int(T * cfg.codebook_prob)
        rng = self.make_rng("codebook")
        perm = jax.random.permutation(rng, T)
        w = jnp.zeros((T,), q["x"].dtype).at[perm[:n_replace]].set(1.0)
        mixed = w[None, :, None] * q["x"] + (1.0 - w)[None, :, None] * enc["encoder_out"]
        enc = dict(enc)
        enc["encoder_out"] = mixed.astype(enc["encoder_out"].dtype)
        return enc, q

    # ------------------------------------------------------- training forwards

    def forward_s2t(self, wav, wav_lengths, prev_tokens, *, mask=True,
                    deterministic=False):
        """ASR/ST training: returns (dec_logits, ctc_logits, enc_valid)."""
        enc = self.encode_speech(
            wav, wav_lengths, mask=mask, deterministic=deterministic, with_ctc=True
        )
        logits = self.decode_text(enc, prev_tokens, deterministic=deterministic)
        return logits, enc["ctc_logits"], enc["valid_mask"]

    def forward_t2s(self, tokens, prev_mel, tgt_lengths, spkembs=None, *,
                    deterministic=False):
        enc = self.encode_text(tokens, deterministic=deterministic)
        return self.decode_speech(
            enc, prev_mel, tgt_lengths, spkembs,
            deterministic=deterministic, need_attn=True,
        )

    def forward_s2s(self, wav, wav_lengths, prev_mel, tgt_lengths, spkembs=None,
                    src_mel=None, *, deterministic=False):
        """VC/SE training: returns (before, after, stop_logits, attn, enc_valid).
        enc_valid is needed for the guided-attention loss (the encoder length
        is in conv-downsampled frames, not raw samples).

        ``src_mel``: SE variant (reference speecht5.py:917-919,
        se_decoder_input='source') — the r-thinned SOURCE fbank replaces the
        shifted previous-target frames as the decoder input (mask-predict
        style enhancement instead of autoregression)."""
        enc = self.encode_speech(wav, wav_lengths, mask=False,
                                 deterministic=deterministic)
        dec_in = prev_mel if src_mel is None else src_mel
        before, after, stop_logits, attn = self.decode_speech(
            enc, dec_in, tgt_lengths, spkembs,
            deterministic=deterministic, need_attn=True,
        )
        if self.cfg.se_predict is not None:
            # SE output mode (reference speecht5.py:937-952): the network
            # predicts a mask over / delta from the source fbank rather than
            # the target directly.  Same-resolution combination requires r=1.
            assert self.cfg.reduction_factor == 1, (
                "se_predict requires reduction_factor == 1"
            )
            assert src_mel is not None, (
                "se_predict requires the se_decoder_input='source' data path"
            )
            if self.cfg.se_predict == "masking":
                before = jax.nn.sigmoid(before) * src_mel
                after = jax.nn.sigmoid(after) * src_mel
            elif self.cfg.se_predict == "delta":
                before = before - src_mel
                after = after - src_mel
            elif self.cfg.se_predict != "target":
                raise ValueError(
                    f"se_predict={self.cfg.se_predict!r} not in "
                    "[masking, target, delta]"
                )
        return before, after, stop_logits, attn, enc["valid_mask"]

    def _sid_head(self, enc, target_onehot=None, deterministic=True):
        """Pool encoder/decoder output and apply the speaker postnet
        (reference speecht5.py:836-842, 925-933)."""
        cfg = self.cfg
        if cfg.sid.pooling == "encoder":
            m = enc["valid_mask"].astype(jnp.float32)
            pooled = (enc["encoder_out"] * m[:, :, None]).sum(1) / jnp.maximum(
                m.sum(1), 1.0
            )[:, None]
        elif cfg.sid.pooling == "encoder-cls":
            pooled = enc["encoder_out"][:, 0]
        else:  # "decoder": zero [CLS] vector through the decoder, mean-pool
            B = enc["encoder_out"].shape[0]
            # reference zeroes the embedded prev_output_tokens ([eos]) AFTER
            # the text decoder prenet (speecht5.py:896-898): a zero vector CLS
            x = jnp.zeros((B, 1, cfg.decoder.d_model), cfg.compute_dtype)
            feats, _ = self.decoder(
                x, enc["encoder_out"], enc_valid=enc["valid_mask"],
                self_valid=jnp.ones((B, 1), bool), deterministic=deterministic,
            )
            pooled = feats.mean(axis=1)
        return self.speaker_decoder_postnet(
            pooled, target_onehot, deterministic=deterministic
        )

    def forward_s2c(self, wav, wav_lengths, targets=None, *, mask=False,
                    deterministic=False):
        """SID training forward: returns (logits [B, C], embed [B, E]).

        ``targets``: [B] int class ids; one-hot is built here for the margin
        softmax (reference speecht5.py:805-808).
        """
        sid = self.cfg.sid
        enc = self.encode_speech(
            wav, wav_lengths, mask=mask, deterministic=deterministic,
            prepend_cls=sid.encoder_cls,
            shuffle=sid.shuffle_encoder_input and not deterministic,
        )
        onehot = None
        if targets is not None and self.cfg.sid.softmax_type != "softmax":
            onehot = jax.nn.one_hot(targets, self.cfg.sid.num_classes)
        return self._sid_head(enc, onehot, deterministic=deterministic)

    def generate_class(self, wav, wav_lengths):
        """SID inference (reference speecht5.py:1171-1186): argmax class ids [B]."""
        logits, _ = self.forward_s2c(
            wav, wav_lengths, mask=False, deterministic=True
        )
        return jnp.argmax(logits, axis=-1)

    def forward_pretrain_speech(
        self, wav, wav_lengths, prev_mel, tgt_lengths, spkembs=None, *,
        num_updates=0, deterministic=False,
    ):
        """Speech pretraining: HuBERT NCE on masked frames + TTS-style decoder
        reconstruction (reference criterions/speech_pretrain_criterion.py)."""
        enc = self.encode_speech(
            wav, wav_lengths, mask=True, deterministic=deterministic
        )
        hubert_logits = self.hubert_logits(enc)
        q = None
        if self.cfg.quantizer.enabled:
            enc, q = self.apply_codebook(
                enc, num_updates=num_updates, deterministic=deterministic
            )
        before, after, stop_logits, attn = self.decode_speech(
            enc, prev_mel, tgt_lengths, spkembs,
            deterministic=deterministic, need_attn=True,
        )
        return {
            "hubert_logits": hubert_logits,
            "time_mask": enc["time_mask"],
            "valid_mask": enc["valid_mask"],
            "features_pen": enc["features_pen"],
            "before": before,
            "after": after,
            "stop_logits": stop_logits,
            "attn": attn,
            "quantizer": q,
        }

    def forward_pretrain_text(self, tokens, prev_tokens, *, num_updates=0,
                              deterministic=False):
        """BART-style text denoising (reference criterions/text_pretrain_criterion.py)."""
        enc = self.encode_text(tokens, deterministic=deterministic)
        q = None
        if self.cfg.quantizer.enabled:
            enc, q = self.apply_codebook(
                enc, num_updates=num_updates, deterministic=deterministic
            )
        logits = self.decode_text(enc, prev_tokens, deterministic=deterministic)
        return {"logits": logits, "quantizer": q}
