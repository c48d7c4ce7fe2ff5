"""VioLA: unified multi-task codec language model (arXiv 2305.16107).

The reference README advertises VioLA alongside VALL-E X and
Prosody-SpeechT5 with NO code in its tree (reference README.md:24-28);
this implementation is built from the paper on this repo's decoder
substrate.  VioLA casts every speech/text task as conditional token
language modeling over ONE decoder-only transformer:

    ASR : [<lang>][<asr>] semantic-units <sep> text            </s>
    MT  : [<lang>][<mt>]  text_src       <sep> text_tgt        </s>
    TTS : [<lang>][<tts>] text           <sep> acoustic-codes  </s>
    ST  : compose ASR -> MT (or train the direct pair)

One shared embedding covers control ids (pad/eos/sep + task ids + language
ids), text tokens, semantic units and acoustic codebook-0 codes; the loss
is cross-entropy masked to the TARGET segment (after <sep>).  Acoustic
codebooks 2..K come from a VALL-E-style NAR stage — VioLA adopts the same
multi-codebook factorization, so the NAR here IS this repo's VALLEX_NAR
instantiated over VioLA's shared token space (models/vallex.py).

TPU-first: the whole model is a causal LM with a KV cache — training is
one dense [B, L] pass, generation reuses the cache machinery shared with
the other decoders; no per-task submodules, no dynamic shapes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace as dc_replace
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig, RelPosConfig
from .decoder import TransformerDecoder
from .vallex import VALLEX_NAR, VALLEXConfig
from ..ops.positional import fairseq_sinusoidal_table

TASKS = ("asr", "mt", "tts")


@dataclass(frozen=True)
class VioLAConfig:
    text_vocab: int = 512
    unit_vocab: int = 1024            # semantic codec units (ASR source side)
    codebook_size: int = 1024         # acoustic codec codes per codebook
    n_codebooks: int = 8
    n_langs: int = 4
    trunk: TransformerConfig = field(default_factory=lambda: TransformerConfig(
        d_model=1024, ffn_dim=4096, num_layers=24, num_heads=16,
        layer_norm_first=True, use_rel_pos_bias=False,
        rel_pos=RelPosConfig(enabled=False),
    ))
    nar: TransformerConfig = field(default_factory=lambda: TransformerConfig(
        d_model=1024, ffn_dim=4096, num_layers=12, num_heads=16,
        layer_norm_first=True, use_rel_pos_bias=False,
        rel_pos=RelPosConfig(enabled=False),
    ))
    max_positions: int = 4096
    scale_embedding: bool = True
    dtype: str = "float32"
    pad_id: int = 1
    eos_id: int = 2
    sep_id: int = 3

    # ---- shared token space layout (all offsets static) ----
    @property
    def task0(self) -> int:
        return 4

    @property
    def lang0(self) -> int:
        return self.task0 + len(TASKS)

    @property
    def n_special(self) -> int:
        return self.lang0 + self.n_langs

    @property
    def text0(self) -> int:
        return self.n_special

    @property
    def unit0(self) -> int:
        return self.text0 + self.text_vocab

    @property
    def code0(self) -> int:
        return self.unit0 + self.unit_vocab

    @property
    def total_vocab(self) -> int:
        return self.code0 + self.codebook_size

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    def task_id(self, task: str) -> int:
        return self.task0 + TASKS.index(task)

    def lang_id(self, lang: int) -> int:
        return self.lang0 + lang


def viola_tiny(**kw) -> VioLAConfig:
    t = TransformerConfig(
        d_model=48, ffn_dim=96, num_layers=2, num_heads=4,
        dropout=0.0, attention_dropout=0.0, layer_norm_first=True,
        use_rel_pos_bias=False, rel_pos=RelPosConfig(enabled=False),
    )
    return dc_replace(
        VioLAConfig(
            text_vocab=16, unit_vocab=12, codebook_size=12, n_codebooks=3,
            n_langs=2, trunk=t, nar=t, max_positions=128,
        ), **kw,
    )


def build_example(cfg: VioLAConfig, task: str, lang: int,
                  src: Sequence[int], tgt: Sequence[int],
                  max_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """One training row: ``[<lang>][<task>] src <sep> tgt </s>`` padded to
    ``max_len``; returns (tokens, target_mask) where target_mask selects the
    positions whose NEXT-token prediction is supervised (the tgt segment +
    the closing eos).  ``src``/``tgt`` must already be mapped into the
    shared space (``text0 + id`` / ``unit0 + id`` / ``code0 + id``)."""
    seq = ([cfg.lang_id(lang), cfg.task_id(task)] + list(src)
           + [cfg.sep_id] + list(tgt) + [cfg.eos_id])
    assert len(seq) <= max_len, (len(seq), max_len)
    tokens = np.full((max_len,), cfg.pad_id, np.int32)
    tokens[: len(seq)] = seq
    mask = np.zeros((max_len,), bool)
    sep_pos = 2 + len(src)
    # the supervised TOKENS: the target segment and its closing eos (the
    # loss weights the prediction of token p by mask[p])
    mask[sep_pos + 1 : sep_pos + 2 + len(tgt)] = True
    return tokens, mask


class VioLAModel(nn.Module):
    cfg: VioLAConfig

    def setup(self):
        cfg = self.cfg
        self.dtype = cfg.compute_dtype
        self.embed_tokens = nn.Embed(
            cfg.total_vocab, cfg.trunk.d_model, param_dtype=jnp.float32,
            name="embed_tokens",
        )
        self.decoder = TransformerDecoder(cfg.trunk, dtype=self.dtype)
        # acoustic codebooks 2..K: VALL-E-style NAR over the shared space
        self.nar = VALLEX_NAR(
            VALLEXConfig(
                phoneme_vocab=cfg.total_vocab,
                codebook_size=cfg.codebook_size,
                n_codebooks=cfg.n_codebooks,
                d_model=cfg.nar.d_model, nar=cfg.nar,
                pad_id=cfg.pad_id, max_len=cfg.max_positions,
                dtype=cfg.dtype,
            ),
            name="nar",
        )

    # ------------------------------------------------------------- embed/lm
    def _embed(self, tokens, positions):
        cfg = self.cfg
        scale = math.sqrt(cfg.trunk.d_model) if cfg.scale_embedding else 1.0
        x = self.embed_tokens(tokens).astype(self.dtype) * scale
        table = jnp.asarray(fairseq_sinusoidal_table(
            cfg.pad_id + 2 + cfg.max_positions, cfg.trunk.d_model, cfg.pad_id
        ))
        return x + table[positions].astype(self.dtype)

    def _logits(self, feats):
        return feats.astype(jnp.float32) @ (
            self.embed_tokens.embedding.T.astype(jnp.float32)
        )

    def __call__(self, tokens, deterministic: bool = True):
        """Teacher-forced multi-task LM: [B, L] -> logits [B, L, V].
        logits[:, t] predicts tokens[:, t+1]; mask with build_example's
        target_mask shifted accordingly in the loss."""
        cfg = self.cfg
        valid = tokens != cfg.pad_id
        pos = cfg.pad_id + jnp.cumsum(valid.astype(jnp.int32), -1) * valid
        x = self._embed(tokens, pos)
        feats, _ = self.decoder(
            x, None, self_valid=valid, causal=True,
            deterministic=deterministic,
        )
        return self._logits(feats)

    def lm_loss(self, tokens, target_mask, deterministic: bool = True):
        """CE over the target segments only (paper's multi-task objective).
        target_mask[b, t] marks positions whose token is a TARGET (to be
        predicted from the prefix before it)."""
        logits = self(tokens, deterministic=deterministic)
        lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(
            lp, tokens[:, 1:, None], axis=-1)[..., 0]
        w = target_mask[:, 1:].astype(jnp.float32)
        return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)

    # ----------------------------------------------------------- generation
    def init_cache(self, batch_size: int, max_len: int):
        return self.decoder.init_cache(None, batch_size, max_len)

    def decode_step(self, tokens_t, cache, *, self_valid=None):
        """tokens_t: [B, Tq] (Tq=prefill length or 1) -> (logits [B, V],
        cache)."""
        cfg = self.cfg
        pos = cfg.pad_id + 1 + cache["index"] + jnp.arange(tokens_t.shape[1])
        x = self._embed(tokens_t, jnp.broadcast_to(
            pos[None, :], tokens_t.shape))
        feats, cache, _ = self.decoder.decode_step(
            x, cache, self_valid=self_valid)
        return self._logits(feats[:, -1]), cache

    def generate(self, prefix, *, max_new: int, eos_id: Optional[int] = None,
                 allowed_range: Optional[Tuple[int, int]] = None):
        """Greedy AR continuation of ``prefix`` [B, Lp] (same length per
        row; right-pad with pad_id and the mask handles it).  Constrains
        emissions to ``allowed_range`` [lo, hi) of the shared space when
        given (e.g. the acoustic-code block for TTS).  Returns
        (tokens [B, max_new], lengths [B])."""
        cfg = self.cfg
        eos = cfg.eos_id if eos_id is None else eos_id
        B, Lp = prefix.shape
        Lmax = Lp + max_new
        cache = self.init_cache(B, Lmax)
        self_valid = jnp.concatenate(
            [prefix != cfg.pad_id, jnp.ones((B, max_new), bool)], axis=1
        )

        def constrain(logits):
            if allowed_range is None:
                mask = jnp.zeros((cfg.total_vocab,), bool).at[eos].set(True)
                mask = mask.at[cfg.pad_id].set(False)
                keep = jnp.ones((cfg.total_vocab,), bool)
                keep = keep.at[cfg.pad_id].set(False)
                return jnp.where(keep[None, :], logits, -1e9)
            lo, hi = allowed_range
            keep = jnp.zeros((cfg.total_vocab,), bool)
            keep = keep.at[lo:hi].set(True).at[eos].set(True)
            return jnp.where(keep[None, :], logits, -1e9)

        logits, cache = self.decode_step(prefix, cache,
                                         self_valid=self_valid)
        tok = jnp.argmax(constrain(logits), axis=-1)
        out = jnp.zeros((B, max_new), jnp.int32).at[:, 0].set(tok)
        done = tok == eos
        lengths = jnp.where(done, 0, max_new)

        def body(i, carry):
            out, cache, done, lengths = carry
            prev_tok = jax.lax.dynamic_slice_in_dim(out, i - 1, 1, axis=1)
            logits, cache = self.decode_step(
                prev_tok, cache, self_valid=self_valid)
            tok = jnp.argmax(constrain(logits), axis=-1)
            tok = jnp.where(done, cfg.pad_id, tok)
            newly = (~done) & (tok == eos)
            lengths = jnp.where(newly, i, lengths)
            done = done | newly
            return out.at[:, i].set(tok), cache, done, lengths

        out, cache, done, lengths = jax.lax.fori_loop(
            1, max_new, body, (out, cache, done, lengths))
        return out, lengths

    # ------------------------------------------------------------------ NAR
    def nar_logits(self, context_tokens, codes, stage, *, code_valid=None,
                   deterministic=True):
        """Acoustic codebook ``stage`` (static int in [1, n_codebooks)) from
        the task context + codebooks < stage.  ``codes``: RAW codebook ids
        [B, n_codebooks, T] (0-based, not shifted into the shared space)."""
        return self.nar(context_tokens, codes, stage,
                        code_valid=code_valid, deterministic=deterministic)

    def init_all(self, tokens, codes):
        self(tokens)
        for stage in range(1, self.cfg.n_codebooks):
            self.nar_logits(tokens, codes, stage)
        return ()


def init_viola(cfg: VioLAConfig, rng):
    model = VioLAModel(cfg)
    tokens = jnp.full((1, 8), cfg.eos_id, jnp.int32)
    codes = jnp.zeros((1, cfg.n_codebooks, 4), jnp.int32)
    variables = jax.jit(
        lambda: model.init(rng, tokens, codes, method="init_all")
    )()
    return model, variables
