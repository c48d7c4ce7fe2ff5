"""ASR / ST decoding: jitted joint CTC/attention beam search with LM fusion.

Assembles the pieces the reference spreads across sequence_generator.py:
- encoder forward + CTC head (reference speecht5.py:1112-1140, encoder.py:174-179)
- KV-cached decoder steps (reference speecht5.py:1151-1164)
- per-step score combination (reference sequence_generator.py:370-432):
    top ctc_beam candidates:  (1-w)*att_lprob + w*(ctc_prefix_delta)
    then + lm_weight * lm_lprob;  blank/pad suppressed, unk penalized.

Everything runs on device for the full batch (the reference needs batch=1 and
hops to CPU for espnet CTCPrefixScore every step).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import ctc_prefix
from .beam_search import beam_search, BeamResult, NEG_INF

CTC_SCORING_RATIO = 1.5  # ctc_beam = beam * ratio (reference CTC_SCORING_RATIO=1.5)


def _tile_rows(x, beam):
    """[B, ...] -> [B*beam, ...] repeating each row beam times."""
    return jnp.repeat(x, beam, axis=0)


class ASRDecoder:
    """Builds a jitted end-to-end decode function for a SpeechT5-family model."""

    def __init__(
        self,
        model,
        variables,
        *,
        beam_size: int = 5,
        max_len: int = 256,
        ctc_weight: float = 0.0,
        lm=None,
        lm_variables=None,
        lm_weight: float = 0.0,
        length_penalty: float = 1.0,
        min_len: int = 1,
        unk_penalty: float = 0.0,
        suppress_ids: tuple = (),
        no_repeat_ngram_size: int = 0,
        encode_method: str = "encode_speech",
        cache_reorder: str = "ancestry",
        steps_per_iter: int = 4,
    ):
        """``encode_method``: model method producing {encoder_out, valid_mask
        [, ctc_logits]} — e.g. "encode_speech" (ASR/ST), "encode_text"
        (YiTrans MT), "encode_av" (VATLM); its positional args are whatever
        __call__ receives.

        ``variables`` may be a single variables dict or a list/tuple of them
        (an ensemble of same-architecture checkpoints): decoder log-probs are
        averaged in probability space (logsumexp - log M) and CTC posteriors
        come from the first model, matching the reference EnsembleModel
        (reference sequence_generator.py:819-961, :273-277, :928-934).

        ``cache_reorder``: "ancestry" (default) keeps the self-attn KV
        caches unpermuted across beam reorders and shuffles an [N, L+1]
        int32 ancestor map instead, which attention uses to index the
        cache — the per-step gather of the full caches was ~73%% of the
        AR-step cost at L=170 (bench_decode_breakdown.py).  "gather"
        physically reorders the caches each step (the fairseq
        reorder_incremental_state semantics, and the fallback if a model
        lacks cache_rows support)."""
        self.model = model
        self.variables = (
            tuple(variables) if isinstance(variables, (list, tuple))
            else (variables,)
        )
        self.cfg = model.cfg
        self.beam_size = beam_size
        self.max_len = max_len
        self.ctc_weight = ctc_weight
        self.lm = lm
        self.lm_variables = lm_variables
        self.lm_weight = lm_weight
        self.length_penalty = length_penalty
        self.min_len = min_len
        self.unk_penalty = unk_penalty
        self.suppress_ids = tuple(suppress_ids)
        self.no_repeat_ngram_size = no_repeat_ngram_size
        self.encode_method = encode_method
        if cache_reorder not in ("ancestry", "gather"):
            raise ValueError(f"cache_reorder: {cache_reorder!r}")
        self.cache_reorder = cache_reorder
        if steps_per_iter < 1:
            raise ValueError(f"steps_per_iter: {steps_per_iter}")
        self.steps_per_iter = steps_per_iter
        self.ctc_beam = max(2, int(beam_size * CTC_SCORING_RATIO))
        self._decode = jax.jit(self._decode_impl, static_argnames=("batch_size",))

    # ------------------------------------------------------------------ steps

    def _suppress(self, lprobs):
        cfg = self.cfg
        lprobs = lprobs.at[:, cfg.pad_id].set(NEG_INF)
        lprobs = lprobs.at[:, cfg.blank_id].set(NEG_INF)
        for sid in self.suppress_ids:
            lprobs = lprobs.at[:, sid].set(NEG_INF)
        if self.unk_penalty:
            lprobs = lprobs.at[:, cfg.unk_id].add(-self.unk_penalty)
        return lprobs

    def _step(self, variables, lm_variables, consts, toks_t, step, state):
        """``consts`` holds the loop-INVARIANT tensors (cross-attention K/V,
        encoder valid mask, CTC posteriors/lengths).  They live outside the
        beam state on purpose: the beam reorder gathers every leaf of the
        state each step, and although parent rows stay within a sample's beam
        group (so the gather is a semantic no-op for row-tiled tensors), XLA
        cannot prove that — keeping them in the state cost ~400MB of HBM
        traffic per step at base-ASR shapes."""
        cfg = self.cfg
        # hard KeyError if the ancestry-map wiring with beam_search ever
        # diverges — a silent None here would leave the cache gather-exempt
        # and produce wrong decodes with no error (ADVICE r2)
        rows = state["anc"] if self.cache_reorder == "ancestry" else None
        atts, new_caches = [], []
        for i, v in enumerate(variables):
            cache = {
                "index": state["cache"][i]["index"],
                "layers": state["cache"][i]["layers"],
                "cross": consts["cross"][i],
            }
            logits, cache = self.model.apply(
                v, toks_t, cache,
                enc_valid=consts["enc_valid"], cache_rows=rows,
                method="text_decode_step",
            )
            atts.append(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
            new_caches.append(
                {"index": cache["index"], "layers": cache["layers"]}
            )
        if len(atts) == 1:
            att = atts[0]
        else:
            # ensemble: mean of probabilities, in log space
            # (reference sequence_generator.py:928-934)
            att = jax.nn.logsumexp(jnp.stack(atts), axis=0) - jnp.log(len(atts))
        lprobs = att
        state = dict(state, cache=tuple(new_caches))

        if self.ctc_weight > 0:
            w = self.ctc_weight
            cs: ctc_prefix.CTCPrefixState = state["ctc"]
            # candidate preselection on attention scores with blank/eos removed
            sel = self._suppress(att).at[:, cfg.eos_id].set(NEG_INF)
            _, cand_ids = jax.lax.top_k(sel, self.ctc_beam)        # [N, K]
            psi, _ = ctc_prefix.score_candidates(
                cs, consts["ctc_lprobs"], consts["enc_lengths"], cand_ids,
                cfg.blank_id, state["ctc_empty"],
            )
            delta = psi - cs.psi[:, None]
            att_cand = jnp.take_along_axis(att, cand_ids, axis=1)
            # candidates get (1-w)*att + w*delta; other tokens keep their RAW
            # attention score — matching the reference exactly
            # (sequence_generator.py:385-387 assigns only local_best_ids)
            combined = (1.0 - w) * att_cand + w * delta
            lprobs = jax.vmap(lambda lp, ids, vals: lp.at[ids].set(vals))(
                lprobs, cand_ids, combined
            )
            # eos: ctc score of terminating = full-prefix probability
            eos_delta = ctc_prefix.eos_score(cs, consts["enc_lengths"]) - cs.psi
            lprobs = lprobs.at[:, cfg.eos_id].set(
                (1.0 - w) * att[:, cfg.eos_id] + w * eos_delta
            )

        if self.lm is not None and self.lm_weight != 0.0:
            lm_logits, lm_cache = self.lm.apply(
                lm_variables, toks_t, state["lm_cache"],
                method="decode_step",
            )
            lprobs = lprobs + self.lm_weight * jax.nn.log_softmax(
                lm_logits.astype(jnp.float32), axis=-1
            )
            state = dict(state, lm_cache=lm_cache)

        lprobs = self._suppress(lprobs)
        return lprobs, state

    def _select(self, variables, consts, state, tok):
        if self.ctc_weight <= 0:
            return state
        cs = state["ctc"]
        _, cand_state = ctc_prefix.score_candidates(
            cs, consts["ctc_lprobs"], consts["enc_lengths"], tok[:, None],
            self.cfg.blank_id, state["ctc_empty"],
        )
        new_cs = ctc_prefix.select(
            cand_state, jnp.arange(tok.shape[0]), jnp.zeros_like(tok)
        )
        return dict(state, ctc=new_cs, ctc_empty=jnp.zeros_like(state["ctc_empty"]))

    # ------------------------------------------------------------------ decode

    def _decode_impl(self, variables, lm_variables, enc_args,
                     batch_size: int):
        # ``variables`` is a jit ARGUMENT, never a closure: closed-over params
        # would be baked into the HLO as literal constants — a multi-hundred-MB
        # program that remote-compile backends reject outright.
        cfg = self.cfg
        B, K = batch_size, self.beam_size
        N = B * K

        kw = {"with_ctc": True} if self.ctc_weight > 0 else {}
        # per-model encoder forwards + decoder caches (statically unrolled
        # over the — typically 1, at most a handful — ensemble members; each
        # member's KV cache is a separate beam-state entry so the per-step
        # beam reorder gathers it like any other row-tiled tensor)
        encs, crosses, model_caches = [], [], []
        for v in variables:
            enc_i = self.model.apply(
                v, *enc_args, method=self.encode_method, **kw
            )
            # cross K/V and the encoder mask stay UNTILED [B, ...]: every
            # beam in a group shares them, and MultiheadAttention's grouped
            # cross path computes [B*K] queries against [B] keys (5x less
            # K/V traffic per step than tiling to N rows)
            cache = self.model.apply(
                v, enc_i, N, self.max_len + 1, method="init_text_cache",
            )
            encs.append(enc_i)
            crosses.append(cache["cross"])
            model_caches.append(
                {"index": cache["index"], "layers": cache["layers"]}
            )
        enc = encs[0]  # CTC posteriors and masks come from the first model
        #                (reference sequence_generator.py:273-277)
        # loop-invariant tensors go into ``consts`` (closure), NOT the beam
        # state — see _step for why
        consts = {
            "cross": tuple(crosses),
            "enc_valid": enc["valid_mask"],
        }
        state = {
            "cache": tuple(model_caches),
        }
        if self.ctc_weight > 0:
            ctc_lp = jax.nn.log_softmax(
                enc["ctc_logits"].astype(jnp.float32), axis=-1
            )
            enc_lengths = enc["valid_mask"].astype(jnp.int32).sum(-1)
            # posteriors stay UNTILED [B, T, V]: score_candidates reads them
            # grouped, like the cross K/V (init needs per-row tensors once)
            consts["ctc_lprobs"] = ctc_lp
            consts["enc_lengths"] = _tile_rows(enc_lengths, K)
            state["ctc"] = ctc_prefix.init_state(
                _tile_rows(ctc_lp, K), consts["enc_lengths"],
                cfg.blank_id, cfg.eos_id,
            )
            state["ctc_empty"] = jnp.ones((N,), bool)
        if self.lm is not None and self.lm_weight != 0.0:
            state["lm_cache"] = self.lm.apply(
                lm_variables, N, self.max_len + 1, method="init_cache"
            )

        ancestry = self.cache_reorder == "ancestry"
        return beam_search(
            functools.partial(self._step, variables, lm_variables, consts),
            state,
            batch_size=B,
            beam_size=K,
            vocab_size=cfg.vocab_size,
            max_len=self.max_len,
            eos_id=cfg.eos_id,
            length_penalty=self.length_penalty,
            min_len=self.min_len,
            select_fn=functools.partial(self._select, variables, consts),
            no_repeat_ngram_size=self.no_repeat_ngram_size,
            gather_exempt_keys=("cache",) if ancestry else (),
            ancestry_key="anc" if ancestry else None,
            steps_per_iter=self.steps_per_iter,
        )

    def __call__(self, *enc_args) -> BeamResult:
        """Args go to ``encode_method`` (e.g. wav [B, T], wav_lengths for
        "encode_speech"; tokens [B, T] for "encode_text").  Returns
        BeamResult (tokens/scores/lengths)."""
        return self._decode(
            self.variables, self.lm_variables, enc_args,
            batch_size=enc_args[0].shape[0],
        )


class CTCDecoder:
    """Encoder-only CTC decode: one jitted encoder+CTC-head forward for the
    whole batch, then host-side greedy collapse or the native lexicon+LM
    beam decoder (csrc/ctc_beam.cpp).

    This is the reference SpeechLM eval contract — hydra ``infer.py`` with
    viterbi / flashlight-kenlm decoding over CTC emissions (reference
    SpeechLM/speechlm/infer.py:29-33,121, config/decode/infer_viterbi.yaml,
    infer_kenlm.yaml) — and the throughput path: no autoregressive loop, so
    decode cost is one encoder forward (~MXU-bound) per batch.

    ``lexicon``: a ``decode.lexicon.LexiconDecoder`` for mode="lexicon";
    None selects greedy (viterbi) collapse.
    """

    def __init__(self, model, variables, *, blank_id: int,
                 lexicon=None, encode_method: str = "encode_speech"):
        self.model = model
        self.variables = variables
        self.blank_id = blank_id
        self.lexicon = lexicon
        self.encode_method = encode_method
        self._enc = jax.jit(self._enc_impl)
        self._enc_argmax = jax.jit(self._argmax_impl)

    def _encode(self, variables, enc_args):
        enc = self.model.apply(
            variables, *enc_args, method=self.encode_method, with_ctc=True
        )
        lengths = enc["valid_mask"].astype(jnp.int32).sum(-1)
        return enc, lengths

    def _enc_impl(self, variables, enc_args):
        enc, lengths = self._encode(variables, enc_args)
        lp = jax.nn.log_softmax(enc["ctc_logits"].astype(jnp.float32), axis=-1)
        return lp, lengths

    def _argmax_impl(self, variables, enc_args):
        # greedy decode transfers [B, T] int32 frame ids, not the [B, T, V]
        # posterior tensor — the argmax runs on device (the transfer was
        # ~20 MB/batch-32 and dominated the greedy path's host time)
        enc, lengths = self._encode(variables, enc_args)
        return jnp.argmax(enc["ctc_logits"], axis=-1).astype(jnp.int32), lengths

    def posteriors(self, *enc_args):
        """[B, T, V] natural-log CTC posteriors + frame lengths (device)."""
        return self._enc(self.variables, enc_args)

    def __call__(self, *enc_args) -> list:
        """Returns a list of B token-id lists (letters + word-sep tokens)."""
        if self.lexicon is None:
            ids, lengths = self._enc_argmax(self.variables, enc_args)
            return greedy_collapse(np.asarray(ids), np.asarray(lengths),
                                   self.blank_id)
        lp, lengths = self.posteriors(*enc_args)
        lp = np.asarray(lp)
        lengths = np.asarray(lengths)
        return [
            self.lexicon.decode(lp[b, : int(lengths[b])])[0]
            for b in range(lp.shape[0])
        ]


def greedy_collapse(ids: np.ndarray, lengths: np.ndarray,
                    blank_id: int) -> list:
    """Collapse repeats + drop blanks over per-frame argmax ids [B, T]."""
    out = []
    for b in range(ids.shape[0]):
        seq = ids[b, : lengths[b]]
        if len(seq) == 0:
            out.append([])
            continue
        seq = seq[np.concatenate([[True], seq[1:] != seq[:-1]])]
        out.append(seq[seq != blank_id].tolist())
    return out


def greedy_ctc(ctc_logits, lengths, blank_id: int) -> list:
    """Greedy CTC decode (collapse repeats, drop blanks) — the reference uses
    this for in-training WER (reference criterions/speech_to_text_loss.py:232-297).
    Host-side post-processing; input [B, T, V] logits."""
    return greedy_collapse(
        np.asarray(jnp.argmax(ctc_logits, axis=-1)), np.asarray(lengths),
        blank_id,
    )


class RescoreDecoder:
    """Two-pass decode: CTC N-best prefix beam + one teacher-forced decoder
    rescoring forward.

    The reference's joint beam interleaves attention and CTC-prefix scores
    token-by-token inside its AR loop (reference sequence_generator.py:
    273-284,370-418) — serial in decode length.  This splits the same two
    scores into two batched passes:

      1. encoder forward -> CTC posteriors -> open-vocabulary N-best prefix
         beam (decode/nbest.py, native csrc/ctc_beam.cpp:ctc_nbest);
      2. a single jitted teacher-forced decoder forward over all B*N
         hypotheses at once (MXU-batched — no AR loop), scoring each
         hypothesis `sum log P(tok_i | prefix, enc)` including EOS;

    picked by `(1-w)*attention + w*ctc`, the joint beam's combination rule.
    Decode cost is two parallel forwards instead of max_len serial decoder
    steps, so throughput sits near the encoder-only CTC operating point
    (PERF.md section 11) while the decoder pass recovers beam-level WER on
    CTC confusions (e.g. doubled letters: HELLO vs HELO).
    """

    def __init__(self, model, variables, *, blank_id: int, eos_id: int,
                 pad_id: int, nbest: int = 8, beam: int = 16,
                 topk: int = 0, ctc_weight: float = 0.3,
                 max_len: Optional[int] = None, blank_skip: float = 0.95,
                 lexicon=None,
                 encode_method: str = "encode_speech", len_step: int = 32):
        """``lexicon``: optional ``decode.lexicon.LexiconDecoder`` — pass 1
        then produces lexicon+LM-constrained N-best (the reference's
        flashlight/kenlm decode), and pass 2 rescoring picks among valid-word
        hypotheses only: the strongest WER operating point."""
        self.model = model
        self.variables = variables
        self.blank_id = blank_id
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.nbest = nbest
        self.beam = max(beam, nbest)
        self.topk = topk
        self.ctc_weight = ctc_weight
        self.max_len = max_len  # cap on scored hypothesis length (tokens)
        # frames with P(blank) above this take only the stay transitions in
        # pass 1 (~90% of frames for trained models); 1.0 disables
        import math as _math

        self.blank_thresh = _math.log(blank_skip) if blank_skip > 0 else 0.0
        self.lexicon = lexicon
        self.encode_method = encode_method
        self.len_step = len_step
        self._enc = jax.jit(self._enc_impl)
        self._score = jax.jit(self._score_impl)

    def _enc_impl(self, variables, enc_args):
        enc = self.model.apply(
            variables, *enc_args, method=self.encode_method, with_ctc=True
        )
        lengths = enc["valid_mask"].astype(jnp.int32).sum(-1)
        lp = jax.nn.log_softmax(enc["ctc_logits"].astype(jnp.float32), axis=-1)
        return enc["encoder_out"], enc["valid_mask"], lp, lengths

    def _score_impl(self, variables, enc_out, enc_valid, prev, tgt, tmask):
        B, N, L = prev.shape
        enc = {
            "encoder_out": jnp.repeat(enc_out, N, axis=0),
            "valid_mask": jnp.repeat(enc_valid, N, axis=0),
        }
        logits = self.model.apply(
            variables, enc, prev.reshape(B * N, L), method="decode_text"
        )
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(
            lsm, tgt.reshape(B * N, L)[..., None], axis=-1
        )[..., 0]
        return (tok_lp * tmask.reshape(B * N, L)).sum(-1).reshape(B, N)

    def __call__(self, *enc_args) -> list:
        """Returns a list of B token-id lists."""
        from .nbest import ctc_nbest_batch

        enc_out, enc_valid, lp, lengths = self._enc(self.variables, enc_args)
        lp_h = np.asarray(lp)
        len_h = np.asarray(lengths)
        B = lp_h.shape[0]
        if self.lexicon is not None:
            batch_cands = [
                self.lexicon.decode_nbest(lp_h[b, : int(len_h[b])],
                                          nbest=self.nbest)
                for b in range(B)
            ]
        else:
            batch_cands = ctc_nbest_batch(
                lp_h, len_h, blank=self.blank_id,
                beam=self.beam, nbest=self.nbest, topk=self.topk,
                blank_thresh=self.blank_thresh,
            )
        hyp_rows, ctc_rows = [], []
        for b in range(B):
            cands = batch_cands[b]
            if not cands:
                cands = [([], 0.0)]
            if self.max_len is not None:
                # Drop over-length hypotheses rather than truncating: a
                # clipped candidate would mix the attention score of the
                # truncated sequence with the CTC score of the full one,
                # mis-ranking it against intact candidates.  Only when EVERY
                # candidate exceeds the cap do we truncate the 1-best — it is
                # then the sole (duplicated) candidate, so the score
                # inconsistency cannot change the argmax.
                kept = [(t, s) for t, s in cands if len(t) <= self.max_len]
                cands = kept or [(cands[0][0][: self.max_len], cands[0][1])]
            while len(cands) < self.nbest:
                cands.append(cands[0])  # duplicate rows tie; argmax -> first
            hyp_rows.append([c[0] for c in cands])
            ctc_rows.append([c[1] for c in cands])

        maxtgt = max(len(h) for row in hyp_rows for h in row) + 1  # + EOS
        L = -(-maxtgt // self.len_step) * self.len_step  # bucket compiles
        prev = np.full((B, self.nbest, L), self.pad_id, np.int32)
        tgt = np.full((B, self.nbest, L), self.pad_id, np.int32)
        tmask = np.zeros((B, self.nbest, L), np.float32)
        prev[:, :, 0] = self.eos_id
        for b, row in enumerate(hyp_rows):
            for n, toks in enumerate(row):
                k = len(toks)
                prev[b, n, 1 : k + 1] = toks
                tgt[b, n, :k] = toks
                tgt[b, n, k] = self.eos_id
                tmask[b, n, : k + 1] = 1.0
        att = np.asarray(self._score(
            self.variables, enc_out, enc_valid,
            jnp.asarray(prev), jnp.asarray(tgt), jnp.asarray(tmask),
        ))
        total = (1.0 - self.ctc_weight) * att \
            + self.ctc_weight * np.asarray(ctc_rows)
        best = total.argmax(axis=1)
        return [hyp_rows[b][int(best[b])] for b in range(B)]
