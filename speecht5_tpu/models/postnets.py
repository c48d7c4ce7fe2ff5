"""Modality postnets.

Behavioral specs:
- SpeechDecoderPostnet: reference modules/speech_decoder_postnet.py:17-76 —
  feat_out (d -> n_mels*r), prob_out (d -> r), Tacotron2 conv postnet refiner.
- TextDecoderPostnet: reference modules/text_decoder_postnet.py:19-93 —
  output projection, optionally weight-tied to the decoder embedding.
- SpeechEncoderPostnet (HuBERT head): reference modules/speech_encoder_postnet.py:17-124
  — cosine-similarity logits against label embeddings / logit_temp.  Reference
  computes an NCE with the positive prepended and the duplicate class masked
  -inf; that is algebraically plain CE over the codebook classes, which is the
  fixed-shape formulation used here.
- SpeakerDecoderPostnet: reference modules/speaker_decoder_postnet.py:129-200 —
  BN pooling, x-vector style embedding, AM/AAM-softmax margin heads.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SpeechT5Config


class TacotronPostnet(nn.Module):
    """espnet Tacotron2 Postnet: n_layers of Conv1d(+BN, tanh except last) with
    residual applied by the caller."""

    n_mels: int
    layers: int
    chans: int
    kernel: int
    dropout: float
    use_batch_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, T, n_mels] -> residual [B, T, n_mels]."""
        pad = (self.kernel - 1) // 2
        for i in range(self.layers):
            last = i == self.layers - 1
            out_ch = self.n_mels if last else self.chans
            x = nn.Conv(
                features=out_ch,
                kernel_size=(self.kernel,),
                padding=[(pad, pad)],
                use_bias=not self.use_batch_norm,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv_{i}",
            )(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(
                    use_running_average=deterministic,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=jnp.float32,
                    name=f"bn_{i}",
                )(x).astype(self.dtype)
            if not last:
                x = jnp.tanh(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class SpeechDecoderPostnet(nn.Module):
    cfg: SpeechT5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.feat_out = nn.Dense(
            cfg.n_mels * cfg.reduction_factor, dtype=jnp.float32,
            param_dtype=self.param_dtype, name="feat_out",
        )
        self.prob_out = nn.Dense(
            cfg.reduction_factor, dtype=jnp.float32,
            param_dtype=self.param_dtype, name="prob_out",
        )
        if cfg.speech_postnet.postnet_layers > 0:
            self.postnet = TacotronPostnet(
                cfg.n_mels,
                cfg.speech_postnet.postnet_layers,
                cfg.speech_postnet.postnet_chans,
                cfg.speech_postnet.postnet_filts,
                cfg.speech_postnet.postnet_dropout,
                cfg.speech_postnet.use_batch_norm,
                self.dtype, self.param_dtype, name="postnet",
            )

    def __call__(self, z, deterministic: bool = True):
        """z: [B, T_r, D] decoder features -> (before [B, T_r*r, n_mels],
        after, stop_logits [B, T_r*r])."""
        cfg = self.cfg
        B, Tr, _ = z.shape
        before = self.feat_out(z).reshape(B, Tr * cfg.reduction_factor, cfg.n_mels)
        logits = self.prob_out(z).reshape(B, Tr * cfg.reduction_factor)
        if hasattr(self, "postnet"):
            after = before + self.postnet(before, deterministic).astype(jnp.float32)
        else:
            after = before
        return before, after, logits

    def project_frames(self, z):
        """feat_out only, for the AR decode loop: [B, 1, D] -> [B, r, n_mels]."""
        cfg = self.cfg
        B = z.shape[0]
        return self.feat_out(z).reshape(B, cfg.reduction_factor, cfg.n_mels)

    def stop_probs(self, z):
        B = z.shape[0]
        return jax.nn.sigmoid(self.prob_out(z).reshape(B, self.cfg.reduction_factor))

    def refine(self, mel, deterministic: bool = True):
        """Apply the conv postnet residual once over the full mel (decode path)."""
        if hasattr(self, "postnet"):
            return mel + self.postnet(mel, deterministic).astype(jnp.float32)
        return mel


class TextDecoderPostnet(nn.Module):
    cfg: SpeechT5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        if not cfg.share_input_output_embed:
            self.output_projection = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=jnp.float32,
                param_dtype=self.param_dtype, name="output_projection",
            )

    def __call__(self, x, embed_matrix=None):
        """x: [..., D] -> logits [..., V].  Pass the decoder embedding matrix for
        the weight-tied variant."""
        if self.cfg.share_input_output_embed:
            assert embed_matrix is not None
            return x.astype(jnp.float32) @ embed_matrix.T.astype(jnp.float32)
        return self.output_projection(x.astype(jnp.float32))


class SpeechEncoderPostnet(nn.Module):
    """HuBERT masked-prediction head."""

    cfg: SpeechT5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        h = cfg.hubert
        total = sum(h.num_classes)
        self.label_embs_concat = self.param(
            "label_embs_concat",
            nn.initializers.uniform(scale=1.0),
            (total, h.final_dim),
            jnp.float32,
        )
        out = h.final_dim * (len(h.num_classes) if h.untie_final_proj else 1)
        self.final_proj = nn.Dense(
            out, dtype=jnp.float32, param_dtype=self.param_dtype, name="final_proj"
        )

    def __call__(self, x):
        """x: [B, T, D] encoder output -> list of cosine-sim logits
        [B, T, C_i] per label set, temperature-scaled."""
        h = self.cfg.hubert
        proj = self.final_proj(x.astype(jnp.float32))
        if h.untie_final_proj:
            projs = jnp.split(proj, len(h.num_classes), axis=-1)
        else:
            projs = [proj] * len(h.num_classes)

        from ..ops.heads import cosine_logits

        logits = []
        offset = 0
        for i, c in enumerate(h.num_classes):
            embs = self.label_embs_concat[offset : offset + c]
            offset += c
            logits.append(cosine_logits(projs[i], embs, h.logit_temp))
        return logits


class SpeakerDecoderPostnet(nn.Module):
    """x-vector style SID head with optional AM/AAM margin softmax.

    Mirrors reference modules/speaker_decoder_postnet.py:129-200: optional
    BatchNorm on the pooled features (``no_pooling_bn``), optional linear
    embedding + BatchNorm (``no_embed_postnet`` — the SID recipe at
    SpeechT5/README.md:649-650 disables both), cosine classifier when a margin
    softmax or ``normalize_postnet`` is set.  The margin transform and its
    scale apply only at train time with a target (reference
    speaker_decoder_postnet.py:16-127 AngularMargin/AdditiveAngularMargin).
    """

    embed_dim: int
    class_num: int
    softmax_type: str = "softmax"   # softmax | amsoftmax | aamsoftmax
    margin: float = 0.0
    scale: float = 1.0
    easy_margin: bool = False
    no_pooling_bn: bool = False
    no_embed_postnet: bool = False
    normalize_postnet: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, target_onehot=None, deterministic: bool = True):
        """x: [B, D] pooled decoder output -> (logits [B, C], embed [B, E])."""
        x = x.astype(jnp.float32)
        if not self.no_pooling_bn:
            x = nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="bn_pooling",
            )(x)
        if not self.no_embed_postnet:
            embed = nn.Dense(
                self.embed_dim, use_bias=False, dtype=jnp.float32,
                param_dtype=self.param_dtype,
                kernel_init=nn.initializers.normal(self.embed_dim ** -0.5),
                name="output_embedding",
            )(x)
            embed = nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="bn_embedding",
            )(embed)
        else:
            embed = x
        w = self.param(
            "projection_weight",
            nn.initializers.normal(stddev=self.class_num ** -0.5),
            (self.class_num, embed.shape[-1]),
            self.param_dtype,
        )
        use_margin = self.softmax_type in ("amsoftmax", "aamsoftmax")
        if use_margin or self.normalize_postnet:
            xn = embed / jnp.maximum(jnp.linalg.norm(embed, axis=-1, keepdims=True), 1e-12)
            wn = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
            cosine = xn @ wn.T
            out = cosine
            if use_margin and target_onehot is not None and not deterministic:
                if self.softmax_type == "amsoftmax":
                    out = self.scale * (cosine - self.margin * target_onehot)
                else:
                    import math

                    cos_m, sin_m = math.cos(self.margin), math.sin(self.margin)
                    th = math.cos(math.pi - self.margin)
                    mm = math.sin(math.pi - self.margin) * self.margin
                    sine = jnp.sqrt(jnp.clip(1.0 - cosine ** 2, 0.0, 1.0))
                    phi = cosine * cos_m - sine * sin_m
                    if self.easy_margin:
                        phi = jnp.where(cosine > 0, phi, cosine)
                    else:
                        phi = jnp.where(cosine > th, phi, cosine - mm)
                    out = self.scale * (
                        target_onehot * phi + (1.0 - target_onehot) * cosine
                    )
        else:
            out = embed @ w.T
        return out, embed
