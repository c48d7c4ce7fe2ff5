"""Lexicon-constrained CTC beam decode with word n-gram LM fusion.

The reference SpeechLM decodes CTC emissions with flashlight's C++
LexiconDecoder + KenLM (reference SpeechLM/speechlm/infer.py:29-33,121,
config/decode/infer_kenlm.yaml).  This module provides the same contract:

- ``LexiconDecoder``: ctypes wrapper over the native decoder in
  csrc/ctc_beam.cpp (built on first use);
- ``lexicon_beam_py``: a pure-Python reference of the identical algorithm,
  used for parity tests and as fallback without a toolchain;
- ``NGramLM``: ARPA backoff LM reader (python mirror of the C++ loader).

Scores are natural-log throughout.
"""

from __future__ import annotations

import ctypes
import math
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.native import _load as _load_lib

NEG_INF = -1e30
LN10 = math.log(10.0)


def log_add(a: float, b: float) -> float:
    if a <= NEG_INF:
        return b
    if b <= NEG_INF:
        return a
    m = max(a, b)
    return m + math.log1p(math.exp(min(a, b) - m))


def _open_arpa(path: str):
    """Open an ARPA file, transparently decompressing ``.gz`` (the reference
    decode recipe ships OpenSLR's 4-gram.arpa.gz,
    reference SpeechLM/README.md:105)."""
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, "rt", encoding="utf-8")
    return open(path, encoding="utf-8")


def materialize_arpa(path: str) -> str:
    """Return a plain-text ARPA path for the native decoder: gzipped input
    is decompressed once to a temp file keyed on (path, mtime) — a stable
    content key (hashlib, NOT hash(): per-process seeding would defeat the
    cache and leak a fresh multi-GB decompression every run)."""
    if not path.endswith(".gz"):
        return path
    import gzip
    import hashlib
    import shutil
    import tempfile

    key = hashlib.sha1(
        f"{os.path.abspath(path)}:{os.path.getmtime(path)}".encode()
    ).hexdigest()[:16]
    out = os.path.join(tempfile.gettempdir(), f"s5_arpa_{key}.arpa")
    if not os.path.exists(out):
        tmp = out + ".partial"
        with gzip.open(path, "rb") as f, open(tmp, "wb") as o:
            shutil.copyfileobj(f, o)
        os.replace(tmp, out)   # atomic: concurrent readers never see partial
    return out


class NGramLM:
    """Backoff word n-gram LM from a standard ARPA file (natural log)."""

    def __init__(self, path: str):
        self.grams: Dict[Tuple[str, ...], Tuple[float, float]] = {}
        self.order = 0
        cur = 0
        with _open_arpa(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if line.startswith("\\"):
                    if line.startswith("\\end\\"):
                        break
                    if line.endswith("-grams:"):
                        cur = int(line[1:].split("-")[0])
                        self.order = max(self.order, cur)
                    continue
                if cur == 0:
                    continue
                parts = line.split()
                logp = float(parts[0]) * LN10
                words = tuple(parts[1 : 1 + cur])
                backoff = (
                    float(parts[1 + cur]) * LN10
                    if len(parts) > 1 + cur else 0.0
                )
                self.grams[words] = (logp, backoff)

    def score(self, ctx: Tuple[str, ...], word: str
              ) -> Tuple[float, Tuple[str, ...]]:
        """log P(word | ctx) with backoff; returns (score, new_ctx)."""
        full = ctx + (word,)
        new_ctx = full[-(self.order - 1):] if self.order > 1 else ()
        bo = 0.0
        for start in range(len(full)):
            sub = full[start:]
            if sub in self.grams:
                return self.grams[sub][0] + bo, new_ctx
            boctx = full[start:-1]
            if boctx and boctx in self.grams:
                bo += self.grams[boctx][1]
        return -23.0 + bo, new_ctx


@dataclass
class _Hyp:
    node: tuple = ()              # partial-word token path
    last: int = -1
    p_b: float = NEG_INF
    p_nb: float = NEG_INF
    lm: float = 0.0
    ctx: tuple = ()
    tokens: tuple = ()

    def total(self) -> float:
        return log_add(self.p_b, self.p_nb) + self.lm


def _build_trie(lexicon: Dict[str, Sequence[int]]):
    """word -> token ids.  Returns (children {path: {tok: path'}},
    words {path: word})."""
    children: Dict[tuple, Dict[int, tuple]] = {(): {}}
    words: Dict[tuple, str] = {}
    for word, toks in lexicon.items():
        path = ()
        for t in toks:
            nxt = path + (int(t),)
            children.setdefault(path, {})[int(t)] = nxt
            children.setdefault(nxt, {})
            path = nxt
        if path not in words:  # first spelling wins (flashlight takes all)
            words[path] = word
    return children, words


def lexicon_beam_py(
    lp: np.ndarray,                      # [T, V] natural-log posteriors
    lexicon: Dict[str, Sequence[int]],   # word -> token-id spelling
    blank: int,
    sep: int,
    lm: Optional[NGramLM] = None,
    lm_weight: float = 0.0,
    word_score: float = 0.0,
    beam: int = 50,
) -> Tuple[List[int], float]:
    """Pure-Python reference of csrc/ctc_beam.cpp (identical algorithm);
    1-best head of ``lexicon_beam_nbest_py``."""
    finals = lexicon_beam_nbest_py(lp, lexicon, blank, sep, lm=lm,
                                   lm_weight=lm_weight,
                                   word_score=word_score, beam=beam,
                                   nbest=1)
    return finals[0] if finals else ([], NEG_INF)


def lexicon_beam_nbest_py(lp, lexicon, blank, sep, lm=None, lm_weight=0.0,
                          word_score=0.0, beam=50, nbest=8):
    """N-best variant of ``lexicon_beam_py``: finalized hypotheses sorted
    by total score (mirrors csrc lexdec_decode_nbest)."""
    children, words = _build_trie(lexicon)
    hyps = [_Hyp(p_b=0.0)]
    for t in range(lp.shape[0]):
        row = lp[t]
        nxt = {}

        def merge(h):
            k = (h.tokens, h.ctx)
            got = nxt.get(k)
            if got is None:
                nxt[k] = h
            else:
                got.p_b = log_add(got.p_b, h.p_b)
                got.p_nb = log_add(got.p_nb, h.p_nb)

        for h in hyps:
            p_tot = log_add(h.p_b, h.p_nb)
            merge(_Hyp(h.node, h.last, p_tot + row[blank], NEG_INF,
                       h.lm, h.ctx, h.tokens))
            if h.last >= 0 and h.p_nb > NEG_INF:
                merge(_Hyp(h.node, h.last, NEG_INF, h.p_nb + row[h.last],
                           h.lm, h.ctx, h.tokens))
            for tok, child in children.get(h.node, {}).items():
                base = h.p_b if tok == h.last else p_tot
                if base <= NEG_INF:
                    continue
                merge(_Hyp(child, tok, NEG_INF, base + row[tok],
                           h.lm, h.ctx, h.tokens + (tok,)))
            if sep >= 0 and h.node in words:
                base = h.p_b if sep == h.last else p_tot
                if base > NEG_INF:
                    lm_s, ctx = h.lm, h.ctx
                    if lm is not None:
                        s, ctx = lm.score(h.ctx, words[h.node])
                        lm_s = h.lm + lm_weight * s + word_score
                    else:
                        lm_s = h.lm + word_score
                    merge(_Hyp((), sep, NEG_INF, base + row[sep],
                               lm_s, ctx, h.tokens + (sep,)))

        hyps = sorted(nxt.values(), key=lambda h: -h.total())[:beam]

    finals = []
    for h in hyps:
        f = _Hyp(h.node, h.last, h.p_b, h.p_nb, h.lm, h.ctx, h.tokens)
        if f.node != () and f.node in words:
            if lm is not None:
                s, f.ctx = lm.score(f.ctx, words[f.node])
                f.lm += lm_weight * s + word_score
            else:
                f.lm += word_score
            f.node = ()
        elif f.node != ():
            f.lm += -1e4
        finals.append(f)
    # Beam entries keyed by (tokens, LM context) can finalize to identical
    # token sequences — dedupe by sequence (max score wins) so duplicates
    # don't occupy N-best slots (mirrors csrc lexdec_decode_nbest).
    best_of = {}
    for f in finals:
        got = best_of.get(f.tokens)
        if got is None or f.total() > got.total():
            best_of[f.tokens] = f
    finals = sorted(best_of.values(), key=lambda h: -h.total())
    return [(list(f.tokens), f.total()) for f in finals[:nbest]]


def build_binary_lm(arpa_path: str, bin_path: str,
                    format: str = "native") -> None:
    """Compile a text ARPA LM into a fast binary format — the role KenLM's
    build_binary plays for the reference's compiled-LM decode (reference
    SpeechLM/speechlm/infer.py:29-33, SpeechLM/README.md:105-121).

    format="native" writes this library's flat format; format="kenlm"
    writes KenLM's probing binary layout (format version 5, PROBING model —
    csrc/ctc_beam.cpp kenlm section documents the byte layout).  Either
    output — and an existing KenLM ``.bin`` artifact — drops in wherever an
    ARPA path is accepted: ``LexiconDecoder`` detects the format by magic.
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native library unavailable (no toolchain?)")
    arpa_path = materialize_arpa(arpa_path)   # accept .arpa.gz here too
    fn = {"native": "lexlm_build_binary",
          "kenlm": "lexlm_build_kenlm_binary"}[format]
    func = getattr(lib, fn)
    func.restype = ctypes.c_int32
    func.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    rc = func(arpa_path.encode(), bin_path.encode())
    if rc != 0:
        raise RuntimeError(f"{fn}({arpa_path}) failed with code {rc}")


class LexiconDecoder:
    """Native lexicon+LM CTC beam decoder (ctypes over csrc/ctc_beam.cpp).

    vocab: list of token symbols indexed by emission column.
    lexicon_path: "word tok1 tok2 ..." lines.  arpa_path: optional ARPA LM.
    """

    def __init__(self, lexicon_path: str, vocab: Sequence[str], *,
                 arpa_path: Optional[str] = None, blank: int, sep: int,
                 lm_weight: float = 0.0, word_score: float = 0.0,
                 beam: int = 50):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native library unavailable (no toolchain?)")
        lib.lexdec_create.restype = ctypes.c_void_p
        lib.lexdec_create.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
            ctypes.c_double, ctypes.c_int32,
        ]
        lib.lexdec_decode.restype = ctypes.c_int64
        lib.lexdec_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ]
        lib.lexdec_decode_nbest.restype = ctypes.c_int64
        lib.lexdec_decode_nbest.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.lexdec_free.restype = None
        lib.lexdec_free.argtypes = [ctypes.c_void_p]
        self._lib = lib
        varr = (ctypes.c_char_p * len(vocab))(
            *[v.encode() for v in vocab]
        )
        if arpa_path:
            arpa_path = materialize_arpa(arpa_path)
        self._h = lib.lexdec_create(
            lexicon_path.encode(),
            (arpa_path or "").encode(),
            varr, len(vocab), blank, sep, lm_weight, word_score, beam,
        )
        if not self._h:
            raise RuntimeError(f"failed to load lexicon {lexicon_path}")

    def decode(self, lp: np.ndarray) -> Tuple[List[int], float]:
        """lp: [T, V] natural-log posteriors -> (token ids, total score)."""
        lp = np.ascontiguousarray(lp, np.float32)
        T, V = lp.shape
        out = np.zeros((T,), np.int32)
        score = ctypes.c_double(0.0)
        n = self._lib.lexdec_decode(
            self._h, lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            T, V, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.byref(score),
        )
        return out[:n].tolist(), score.value

    def decode_nbest(self, lp: np.ndarray, nbest: int = 8
                     ) -> List[Tuple[List[int], float]]:
        """lp: [T, V] natural-log posteriors -> up to ``nbest``
        (token ids, total score) pairs, best first — the lexicon+LM
        constrained pass 1 of the two-pass attention rescore."""
        lp = np.ascontiguousarray(lp, np.float32)
        T, V = lp.shape
        out_tokens = np.zeros((nbest, max(T, 1)), np.int32)
        out_lens = np.zeros((nbest,), np.int32)
        out_scores = np.zeros((nbest,), np.float64)
        n = self._lib.lexdec_decode_nbest(
            self._h, lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            T, V, nbest,
            out_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return [(out_tokens[i, : out_lens[i]].tolist(),
                 float(out_scores[i])) for i in range(n)]

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.lexdec_free(self._h)
            self._h = None
