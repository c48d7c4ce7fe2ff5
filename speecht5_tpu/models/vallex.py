"""VALL-E X: cross-lingual zero-shot TTS as a neural codec language model.

Paper-based build (no reference code exists in the tree — the root README
only links the paper, reference README.md:24-28; BASELINE.json lists it as
the stretch config).  Architecture per the VALL-E / VALL-E X papers
(arXiv:2301.02111, 2303.03926):

- audio is EnCodec-style residual-vector-quantized tokens
  [n_codebooks, T] at 75 Hz;
- **AR stage**: a causal decoder-only LM over the FIRST codebook:
  sequence = [src phonemes] [tgt phonemes] [acoustic prompt codes] [codes...],
  trained with CE on the code segment, stopped by a code-EOS;
- **NAR stage**: a non-causal transformer predicting codebook j from the
  phonemes + the SUM of embeddings of codebooks < j + a stage embedding,
  one parallel pass per residual layer (7 passes for 8 codebooks);
- language ID tokens prepended to the phoneme streams give the
  cross-lingual control.

Runs entirely on the shared substrate: the AR stage reuses TransformerDecoder
(enc=None -> decoder-only with KV-cache while_loop generation), the NAR stage
reuses TransformerEncoder.  The EnCodec codec itself is external (any RVQ
codec producing [n_q, T] int tokens plugs in).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace as dc_replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig, RelPosConfig
from ..ops.positional import espnet_sinusoidal_table
from ..utils.masks import length_mask
from .encoder import TransformerEncoder
from .decoder import TransformerDecoder


@dataclass(frozen=True)
class VALLEXConfig:
    phoneme_vocab: int = 512          # incl. language-id tokens
    codebook_size: int = 1024
    n_codebooks: int = 8
    d_model: int = 1024
    ar: TransformerConfig = field(default_factory=lambda: TransformerConfig(
        d_model=1024, ffn_dim=4096, num_layers=12, num_heads=16,
        layer_norm_first=True, use_rel_pos_bias=False,
        rel_pos=RelPosConfig(enabled=False),
    ))
    nar: TransformerConfig = field(default_factory=lambda: TransformerConfig(
        d_model=1024, ffn_dim=4096, num_layers=12, num_heads=16,
        layer_norm_first=True, use_rel_pos_bias=False,
        rel_pos=RelPosConfig(enabled=False),
    ))
    pad_id: int = 0
    max_len: int = 2048
    dtype: str = "float32"

    @property
    def code_eos(self) -> int:        # extra symbol appended to codebook 0
        return self.codebook_size

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def vallex_tiny(**kw) -> VALLEXConfig:
    t = TransformerConfig(
        d_model=48, ffn_dim=96, num_layers=2, num_heads=4,
        dropout=0.0, attention_dropout=0.0, layer_norm_first=True,
        use_rel_pos_bias=False, rel_pos=RelPosConfig(enabled=False),
    )
    cfg = VALLEXConfig(
        phoneme_vocab=32, codebook_size=24, n_codebooks=4, d_model=48,
        ar=t, nar=t, max_len=128,
    )
    return dc_replace(cfg, **kw)


class VALLEX_AR(nn.Module):
    """Causal codec LM over codebook 0 (decoder-only: enc=None)."""

    cfg: VALLEXConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.phone_embed = nn.Embed(
            cfg.phoneme_vocab, cfg.d_model, name="phone_embed"
        )
        self.code_embed = nn.Embed(
            cfg.codebook_size + 2, cfg.d_model, name="code_embed"
        )  # +eos +bos
        self.decoder = TransformerDecoder(cfg.ar, dtype=dt, name="decoder")
        self.out_proj = nn.Dense(
            cfg.codebook_size + 1, dtype=jnp.float32, name="out_proj"
        )  # +eos

    @property
    def code_bos(self) -> int:
        return self.cfg.codebook_size + 1

    def _embed_seq(self, phonemes, prev_codes):
        """[phonemes][bos + codes] with sinusoidal positions per segment."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        p = self.phone_embed(phonemes).astype(dt)
        c = self.code_embed(prev_codes).astype(dt)
        pos = jnp.asarray(espnet_sinusoidal_table(cfg.max_len, cfg.d_model))
        p = p + pos[: p.shape[1]][None].astype(dt)
        c = c + pos[: c.shape[1]][None].astype(dt)
        x = jnp.concatenate([p, c], axis=1)
        valid = jnp.concatenate(
            [phonemes != cfg.pad_id,
             jnp.ones(prev_codes.shape, bool)], axis=1
        )
        return x, valid

    def __call__(self, phonemes, prev_codes, *, deterministic=True):
        """Teacher-forced: prev_codes [B, T] (bos-shifted codebook-0 stream,
        prompt included).  Returns logits [B, T, codebook_size+1] for the
        code positions only."""
        x, valid = self._embed_seq(phonemes, prev_codes)
        feats, _ = self.decoder(
            x, None, self_valid=valid, causal=True,
            deterministic=deterministic,
        )
        Lp = phonemes.shape[1]
        return self.out_proj(feats[:, Lp:].astype(jnp.float32))

    def generate(self, phonemes, prompt_codes, *, max_new: int = 64,
                 rng=None, temperature: float = 0.0):
        """AR decode of codebook 0: prefill [phonemes][bos + prompt], then
        sample/argmax until code_eos.  Returns (codes [B, max_new], lengths)."""
        cfg = self.cfg
        B = phonemes.shape[0]
        prev = jnp.concatenate(
            [jnp.full((B, 1), self.code_bos, jnp.int32), prompt_codes], axis=1
        )
        x, valid = self._embed_seq(phonemes, prev)
        L0 = x.shape[1]
        Lmax = L0 + max_new
        cache = self.decoder.init_cache(None, B, Lmax)
        # cache-wide self-attention mask: padded phoneme positions are never
        # attendable; prompt + generated positions are (causal mask handles
        # not-yet-written slots)
        self_valid = jnp.concatenate(
            [valid[:, : phonemes.shape[1]],
             jnp.ones((B, Lmax - phonemes.shape[1]), bool)], axis=1
        )
        # prefill: run the prefix through the causal decoder step-by-step is
        # wasteful; run it as one causal pass writing the KV cache via
        # decode_step on the whole prefix (Tq = L0)
        feats, cache, _ = self.decoder.decode_step(x, cache,
                                                   self_valid=self_valid)
        logits = self.out_proj(feats[:, -1:].astype(jnp.float32))[:, 0]

        pos = jnp.asarray(espnet_sinusoidal_table(cfg.max_len, cfg.d_model))
        eos = cfg.code_eos

        def sample(logits, r):
            if temperature <= 0:
                return jnp.argmax(logits, axis=-1)
            return jax.random.categorical(r, logits / temperature, axis=-1)

        rng = jax.random.PRNGKey(0) if rng is None else rng
        tok = sample(logits, rng)
        out = jnp.zeros((B, max_new), jnp.int32).at[:, 0].set(tok)
        done = tok == eos
        lengths = jnp.where(done, 0, max_new)

        def body(carry):
            t, tok, cache, out, done, lengths, rng = carry
            rng, sub = jax.random.split(rng)
            emb = self.code_embed(tok)[:, None].astype(cfg.compute_dtype)
            emb = emb + pos[cache["index"] - phonemes.shape[1]][None, None].astype(
                emb.dtype
            )
            feats, cache, _ = self.decoder.decode_step(
                emb, cache, self_valid=self_valid
            )
            logits = self.out_proj(feats.astype(jnp.float32))[:, 0]
            nxt = sample(logits, sub)
            newly = (~done) & (nxt == eos)
            lengths = jnp.where(newly, t + 1, lengths)
            done = done | newly
            nxt = jnp.where(done, eos, nxt)
            out = out.at[:, t + 1].set(nxt)
            return t + 1, nxt, cache, out, done, lengths, rng

        def cond(carry):
            t, _, _, _, done, _, _ = carry
            return jnp.logical_and(t < max_new - 1, ~jnp.all(done))

        _, _, _, out, done, lengths, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), tok, cache, out, done,
                         lengths, rng)
        )
        return out, lengths


class VALLEX_NAR(nn.Module):
    """Non-causal stage: predict codebook j from phonemes + sum of embeddings
    of codebooks < j + a stage embedding."""

    cfg: VALLEXConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.phone_embed = nn.Embed(
            cfg.phoneme_vocab, cfg.d_model, name="phone_embed"
        )
        # one embedding table per codebook layer (papers share across stages
        # via layer-specific tables)
        self.code_embeds = [
            nn.Embed(cfg.codebook_size, cfg.d_model, name=f"code_embed_{j}")
            for j in range(cfg.n_codebooks)
        ]
        self.stage_embed = nn.Embed(
            cfg.n_codebooks, cfg.d_model, name="stage_embed"
        )
        self.encoder = TransformerEncoder(cfg.nar, dtype=dt, name="encoder")
        self.out_projs = [
            nn.Dense(cfg.codebook_size, dtype=jnp.float32, name=f"out_{j}")
            for j in range(1, cfg.n_codebooks)
        ]

    def __call__(self, phonemes, codes, stage, *, code_valid=None,
                 deterministic=True):
        """codes: [B, n_codebooks, T] (only layers < stage are read);
        ``stage`` is a static int in [1, n_codebooks).  Returns logits
        [B, T, codebook_size] for codebook ``stage``."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, _, T = codes.shape
        p = self.phone_embed(phonemes).astype(dt)
        acc = jnp.zeros((B, T, cfg.d_model), dt)
        for j in range(stage):
            acc = acc + self.code_embeds[j](codes[:, j]).astype(dt)
        acc = acc + self.stage_embed(
            jnp.full((B, T), stage, jnp.int32)
        ).astype(dt)
        pos = jnp.asarray(espnet_sinusoidal_table(cfg.max_len, cfg.d_model))
        p = p + pos[: p.shape[1]][None].astype(dt)
        acc = acc + pos[:T][None].astype(dt)
        x = jnp.concatenate([p, acc], axis=1)
        valid = jnp.concatenate(
            [phonemes != cfg.pad_id,
             code_valid if code_valid is not None else jnp.ones((B, T), bool)],
            axis=1,
        )
        enc = self.encoder(x, valid, deterministic=deterministic)
        feats = enc["encoder_out"][:, phonemes.shape[1]:]
        return self.out_projs[stage - 1](feats.astype(jnp.float32))


class VALLEX(nn.Module):
    """AR + NAR bundle with end-to-end synthesis."""

    cfg: VALLEXConfig

    def setup(self):
        self.ar = VALLEX_AR(self.cfg, name="ar")
        self.nar = VALLEX_NAR(self.cfg, name="nar")

    def init_all(self, phonemes, prev_codes, codes):
        _ = self.ar(phonemes, prev_codes)
        for j in range(1, self.cfg.n_codebooks):
            _ = self.nar(phonemes, codes, j)
        return jnp.zeros(())

    def forward_ar(self, phonemes, prev_codes, *, deterministic=True):
        return self.ar(phonemes, prev_codes, deterministic=deterministic)

    def forward_nar(self, phonemes, codes, stage, *, code_valid=None,
                    deterministic=True):
        return self.nar(phonemes, codes, stage, code_valid=code_valid,
                        deterministic=deterministic)

    def synthesize(self, phonemes, prompt_codes, *, max_new: int = 64,
                   rng=None, temperature: float = 0.0):
        """phonemes [B, Lp] (lang-id + text phonemes), prompt_codes
        [B, n_codebooks, Tp] acoustic prompt.  Returns (codes
        [B, n_codebooks, max_new], lengths [B])."""
        cfg = self.cfg
        B = phonemes.shape[0]
        c0, lengths = self.ar.generate(
            phonemes, prompt_codes[:, 0], max_new=max_new, rng=rng,
            temperature=temperature,
        )
        c0 = jnp.minimum(c0, cfg.codebook_size - 1)  # strip eos for embedding
        valid = length_mask(lengths, max_new)
        codes = jnp.zeros((B, cfg.n_codebooks, max_new), jnp.int32)
        codes = codes.at[:, 0].set(c0 * valid)
        for j in range(1, cfg.n_codebooks):
            logits = self.nar(
                phonemes, codes, j, code_valid=valid, deterministic=True
            )
            codes = codes.at[:, j].set(
                jnp.argmax(logits, axis=-1) * valid
            )
        return codes, lengths


def init_vallex(cfg: VALLEXConfig, rng):
    model = VALLEX(cfg)
    phonemes = jnp.full((1, 4), 3, jnp.int32)
    prev = jnp.full((1, 5), 2, jnp.int32)
    codes = jnp.zeros((1, cfg.n_codebooks, 5), jnp.int32)
    variables = jax.jit(
        lambda: model.init(
            {"params": rng}, phonemes, prev, codes, method="init_all"
        )
    )()
    return model, variables
