"""Open-vocabulary N-best CTC prefix beam search.

Pass 1 of the two-pass CTC -> attention-rescore decode: a lexicon-free
prefix beam (Graves 2012 / Hannun 2014) over the encoder's CTC posteriors
keeps the N best label prefixes; pass 2 (decode/asr.RescoreDecoder) scores
them with one teacher-forced decoder forward.  The reference's joint beam
interleaves the same two scores token-by-token inside its AR loop
(reference SpeechT5/speecht5/sequence_generator.py:273-284,370-418); the
two-pass split gets the same signal at encoder-forward cost.

- ``ctc_nbest``: native C++ decoder (csrc/ctc_beam.cpp:ctc_nbest) via
  ctypes, falling back to the pure-Python reference;
- ``ctc_nbest_py``: the reference implementation, used for parity tests.

Scores are natural-log throughout.
"""

from __future__ import annotations

import ctypes
from typing import List, Tuple

import numpy as np

from ..data.native import _load as _load_lib
from .lexicon import NEG_INF, log_add

_sig_done = False


def _native():
    global _sig_done
    lib = _load_lib()
    if lib is None:
        return None
    if not _sig_done:
        lib.ctc_nbest.restype = ctypes.c_int64
        lib.ctc_nbest.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ctc_nbest_batch.restype = ctypes.c_int64
        lib.ctc_nbest_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ]
        _sig_done = True
    return lib


def ctc_nbest_py(lp: np.ndarray, *, blank: int, beam: int = 16,
                 nbest: int = 8, topk: int = 0, blank_thresh: float = 0.0
                 ) -> List[Tuple[List[int], float]]:
    """Pure-Python reference of csrc/ctc_beam.cpp:ctc_nbest.

    lp: [T, V] natural-log posteriors.  Returns up to ``nbest``
    (token ids, total log-prob) pairs, best first.  ``topk`` restricts each
    frame's extension candidates to the top-k emissions (0 = all); blank and
    the repeat-last transition are always considered.  Frames with
    ``lp[blank] > blank_thresh`` (natural log; >= 0 disables) take only the
    stay transitions — trained CTC models emit ~90% such frames.
    """
    T, V = lp.shape
    hyps = {(): (0.0, NEG_INF)}
    for t in range(T):
        row = lp[t]
        if blank_thresh < 0.0 and row[blank] > blank_thresh:
            nxt = {}
            for toks, (p_b, p_nb) in hyps.items():
                p_tot = log_add(p_b, p_nb)
                last = toks[-1] if toks else -1
                nb = (p_nb + row[last]
                      if last >= 0 and p_nb > NEG_INF else NEG_INF)
                nxt[toks] = (p_tot + row[blank], nb)
            hyps = nxt
            continue
        if topk and topk < V:
            cand = np.argpartition(-row, topk)[:topk].tolist()
        else:
            cand = range(V)
        nxt = {}

        def add(key, p_b, p_nb):
            gb, gnb = nxt.get(key, (NEG_INF, NEG_INF))
            nxt[key] = (log_add(gb, p_b), log_add(gnb, p_nb))

        for toks, (p_b, p_nb) in hyps.items():
            p_tot = log_add(p_b, p_nb)
            last = toks[-1] if toks else -1
            stay_nb = (p_nb + row[last]
                       if last >= 0 and p_nb > NEG_INF else NEG_INF)
            add(toks, p_tot + row[blank], stay_nb)
            for tok in cand:
                tok = int(tok)
                if tok == blank:
                    continue
                # emitting `last` again right away requires a blank between
                base = p_b if tok == last else p_tot
                if base <= NEG_INF:
                    continue
                add(toks + (tok,), NEG_INF, base + row[tok])

        hyps = dict(sorted(nxt.items(),
                           key=lambda kv: -log_add(*kv[1]))[:beam])

    ranked = sorted(hyps.items(), key=lambda kv: -log_add(*kv[1]))[:nbest]
    return [(list(k), log_add(*v)) for k, v in ranked]


def ctc_nbest(lp: np.ndarray, *, blank: int, beam: int = 16, nbest: int = 8,
              topk: int = 0, blank_thresh: float = 0.0
              ) -> List[Tuple[List[int], float]]:
    """N-best CTC prefix beam; native when the toolchain built the library,
    else the Python reference."""
    lib = _native()
    if lib is None:
        return ctc_nbest_py(lp, blank=blank, beam=beam, nbest=nbest,
                            topk=topk, blank_thresh=blank_thresh)
    lp = np.ascontiguousarray(lp, np.float32)
    T, V = lp.shape
    out_tokens = np.zeros((nbest, max(T, 1)), np.int32)
    out_lens = np.zeros((nbest,), np.int32)
    out_scores = np.zeros((nbest,), np.float64)
    n = lib.ctc_nbest(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), T, V,
        blank, beam, nbest, topk, blank_thresh,
        out_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return [(out_tokens[i, : out_lens[i]].tolist(), float(out_scores[i]))
            for i in range(n)]


def ctc_nbest_batch(lp: np.ndarray, lens: np.ndarray, *, blank: int,
                    beam: int = 16, nbest: int = 8, topk: int = 0,
                    blank_thresh: float = 0.0, n_threads: int = 0
                    ) -> List[List[Tuple[List[int], float]]]:
    """Batched N-best over [B, Tmax, V] posteriors with per-utterance frame
    counts.  Utterances decode independently on a native worker pool
    (``n_threads`` 0 = hardware concurrency); pure-Python fallback loops."""
    lib = _native()
    B, Tmax, V = lp.shape
    lens = np.ascontiguousarray(lens, np.int32)
    if lib is None:
        return [
            ctc_nbest_py(lp[b, : int(lens[b])], blank=blank, beam=beam,
                         nbest=nbest, topk=topk, blank_thresh=blank_thresh)
            for b in range(B)
        ]
    lp = np.ascontiguousarray(lp, np.float32)
    out_tokens = np.zeros((B, nbest, max(Tmax, 1)), np.int32)
    out_lens = np.zeros((B, nbest), np.int32)
    out_scores = np.zeros((B, nbest), np.float64)
    out_counts = np.zeros((B,), np.int32)
    lib.ctc_nbest_batch(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B, Tmax, V, blank, beam, nbest, topk, blank_thresh, n_threads,
        out_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return [
        [(out_tokens[b, i, : out_lens[b, i]].tolist(),
          float(out_scores[b, i])) for i in range(out_counts[b])]
        for b in range(B)
    ]
