"""Minimal production-style HTTP serving for ASR and TTS.

The decode runtime (jitted whole-batch beam search, AR mel decode with
in-graph HiFi-GAN) is the serving surface; this CLI wraps it in a
dependency-free HTTP server so a converted checkpoint answers requests:

    POST /asr   body: WAV bytes (16 kHz mono)      -> {"text": ...}
    POST /tts   body: {"text": "..."}               -> WAV bytes
    GET  /healthz                                   -> {"ok": true, ...}

Design notes (single chip):
- requests are padded to a fixed bucket grid so every shape compiles ONCE
  at startup (static shapes; no compile on the request path);
- audio longer than the largest bucket is decoded in overlapping chunks and
  the transcripts joined (never silently truncated); text longer than the
  TTS bucket is rejected with HTTP 413;
- concurrent /asr requests are micro-batched: a collector thread gathers up
  to --max-batch same-bucket requests inside --batch-window-ms and decodes
  them as ONE device program (the batched beam path), so serving throughput
  rides the same whole-batch decode as offline eval;
- device access is serialized with a lock — one program in flight;
- the reference has no serving story at all (inference = fairseq-generate
  batch jobs, SURVEY.md L5/L6).

Usage:
    python -m speecht5_tpu.cli.serve --task s2t --arch speecht5_base_asr \
        --ckpt ckpt/ --dict dict.ltr.txt --port 8080
"""

from __future__ import annotations

import argparse
import io
import json
import os
import struct
import threading
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

# request audio padded up to one of these lengths (seconds * 16k); each
# bucket is one compiled program, warmed at startup
ASR_BUCKETS_S = (4, 8, 16)
SR = 16000


class RequestTooLarge(Exception):
    """Mapped to HTTP 413 — the request exceeds a configured hard cap."""


class _CTCAdapter:
    """Make CTCDecoder (list of token rows) quack like ASRDecoder's
    BeamResult (tokens [B, beam, L] with BOS/EOS framing) so the serving
    paths stay decoder-agnostic."""

    def __init__(self, dec):
        self.dec = dec

    def __call__(self, wav, lengths):
        import types

        rows = self.dec(wav, lengths)
        L = max(len(r) for r in rows) + 2 if rows else 2
        toks = np.zeros((len(rows), 1, max(L, 2)), np.int32)
        lens = np.zeros((len(rows), 1), np.int32)
        for b, r in enumerate(rows):
            toks[b, 0, 1 : 1 + len(r)] = r
            lens[b, 0] = len(r) + 2          # BOS + ids + EOS convention
        return types.SimpleNamespace(tokens=toks, lengths=lens)


def _parse_wav(body: bytes) -> np.ndarray:
    with wave.open(io.BytesIO(body)) as w:
        assert w.getnchannels() == 1, "mono required"
        assert w.getframerate() == SR, f"expected {SR} Hz"
        assert w.getsampwidth() == 2, "16-bit PCM required"
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return pcm.astype(np.float32) / 32768.0


def _wav_bytes(wav: np.ndarray) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        pcm = np.clip(wav, -1.0, 1.0)
        w.writeframes((pcm * 32767.0).astype(np.int16).tobytes())
    return buf.getvalue()


class Service:
    """Owns the compiled decoders; one device program in flight at a time."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp

        from .. import config as C
        from ..data.dictionary import load_cli_dictionary, letters_to_text
        from ..models.speecht5 import init_model
        from ..utils.checkpoint import CheckpointManager

        self._jnp = jnp
        self._letters_to_text = letters_to_text
        self.lock = threading.Lock()
        self.args = args

        dictionary, cfg_kw = load_cli_dictionary(args.dict_path, None)
        cfg_kw["dtype"] = args.dtype
        self.dictionary = dictionary
        cfg = getattr(C, args.arch)(**cfg_kw)
        self.cfg = cfg
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        restored, step = CheckpointManager(args.ckpt).restore_model(variables)
        if restored is None:
            raise SystemExit(f"no checkpoint in {args.ckpt}")
        self.variables = restored
        self.model = model
        print(f"loaded checkpoint step {step}", flush=True)

        self.asr = None
        self.tts = None
        self.max_batch = max(1, args.max_batch)
        self.batch_window_s = args.batch_window_ms / 1000.0
        self.asr_calls = 0      # device programs launched
        self.asr_requests = 0   # chunks decoded (>= calls under batching)
        self._queue = []
        self._queue_cv = threading.Condition()
        self.tts_calls = 0
        self.tts_requests = 0
        self._tts_queue = []
        self._tts_cv = threading.Condition()
        if args.task in ("s2t", "both"):
            if args.decoder == "ctc_greedy":
                # encoder-only viterbi decode: one MXU-bound forward per
                # batch, no AR loop — 17x the beam path's throughput
                # (PERF.md §11); WER cost is the no-LM greedy gap
                from ..decode.asr import CTCDecoder

                self.asr = _CTCAdapter(CTCDecoder(
                    model, self.variables, blank_id=cfg.blank_id))
            elif args.decoder == "ctc_rescore":
                # two-pass CTC N-best + teacher-forced decoder rescore:
                # beam-level WER at near-greedy throughput (no AR loop);
                # --lexicon [--lm-path] constrains pass 1 to lexicon words
                # with n-gram LM fusion
                from ..decode.asr import RescoreDecoder

                lexicon = None
                if args.lexicon:
                    from ..decode.lexicon import LexiconDecoder

                    sep_id = dictionary.index("|")
                    if sep_id == dictionary.unk_index:
                        raise SystemExit(
                            "dictionary has no '|' word separator")
                    lexicon = LexiconDecoder(
                        args.lexicon, list(dictionary.symbols),
                        arpa_path=args.lm_path, blank=cfg.blank_id,
                        sep=sep_id, lm_weight=args.lm_weight,
                        word_score=args.word_score,
                        beam=args.ctc_beam_size,
                    )
                self.asr = _CTCAdapter(RescoreDecoder(
                    model, self.variables, blank_id=cfg.blank_id,
                    eos_id=cfg.eos_id, pad_id=cfg.pad_id,
                    nbest=args.rescore_nbest, beam=args.ctc_beam_size,
                    topk=args.ctc_topk,
                    ctc_weight=args.ctc_weight, max_len=args.max_len,
                    lexicon=lexicon))
            else:
                from ..decode.asr import ASRDecoder

                self.asr = ASRDecoder(
                    model, self.variables, beam_size=args.beam,
                    max_len=args.max_len, ctc_weight=args.ctc_weight,
                )
            batch_sizes = {1, self.max_batch}
            for secs in self.buckets():
                for bs in sorted(batch_sizes):
                    wav = jnp.zeros((bs, secs * SR), jnp.float32)
                    res = self.asr(wav, jnp.full((bs,), secs * SR, jnp.int32))
                    jax.block_until_ready(res.tokens)
                    print(f"warmed ASR bucket {secs}s batch {bs}", flush=True)
            if self.max_batch > 1:
                t = threading.Thread(target=self._batcher_loop, daemon=True)
                t.start()
        if args.task in ("t2s", "both"):
            from ..decode.tts import TTSDecoder
            from ..models.hifigan import HiFiGANConfig, HiFiGANGenerator

            voc = voc_vars = None
            if args.vocoder_ckpt:
                voc = HiFiGANGenerator(HiFiGANConfig(in_dim=cfg.n_mels))
                voc_tpl = voc.init(jax.random.PRNGKey(2),
                                   jnp.zeros((1, 8, cfg.n_mels)))
                voc_vars, _ = CheckpointManager(
                    args.vocoder_ckpt).restore_model(voc_tpl)
            self.tts = TTSDecoder(
                model, self.variables, max_frames=args.max_frames,
                vocoder=voc, vocoder_variables=voc_vars,
            )
            for bs in sorted({1, self.max_batch}):
                toks = jnp.full((bs, args.tts_bucket_tokens), cfg.eos_id,
                                jnp.int32)
                spk = jnp.zeros((bs, cfg.spk_embed_dim), jnp.float32)
                out = self.tts.text_to_speech(toks, spk)
                jax.block_until_ready(out.mel)
                print(f"warmed TTS batch {bs}", flush=True)
            if self.max_batch > 1:
                t = threading.Thread(target=self._tts_batcher_loop,
                                     daemon=True)
                t.start()

    def buckets(self):
        return [int(s) for s in self.args.asr_buckets.split(",")]

    # ------------------------------------------------------------------ ops
    def _chunk(self, wav: np.ndarray):
        """Split audio into the bucket grid: one chunk when it fits, else
        overlapping windows of the largest bucket (hop = bucket - overlap)
        so nothing is dropped."""
        n = len(wav)
        top = self.buckets()[-1] * SR
        if self.args.max_audio_s and n > self.args.max_audio_s * SR:
            raise RequestTooLarge(
                f"audio is {n / SR:.1f}s; --max-audio-s "
                f"{self.args.max_audio_s}"
            )
        if n <= top:
            return [wav]
        overlap = int(self.args.chunk_overlap_s * SR)
        hop = max(top - overlap, 1)
        chunks = []
        for start in range(0, n, hop):
            chunks.append(wav[start : start + top])
            if start + top >= n:
                break
        return chunks

    def _decode_batch(self, wavs, lengths, n_real=None):
        """One device program over a padded same-bucket batch; returns the
        detokenized texts for the first ``n_real`` rows (padding rows are
        decoded by the program but never counted nor detokenized)."""
        jnp = self._jnp
        n_real = len(wavs) if n_real is None else n_real
        with self.lock:
            res = self.asr(jnp.asarray(wavs),
                           jnp.asarray(lengths, jnp.int32))
            toks = np.asarray(res.tokens)[:, 0]
            lens = np.asarray(res.lengths)[:, 0]
            self.asr_calls += 1
            self.asr_requests += n_real
        out = []
        for b in range(n_real):
            hyp_ids = toks[b, 1 : max(int(lens[b]) - 1, 1)]
            out.append(self._letters_to_text(self.dictionary.string(hyp_ids)))
        return out

    def _bucket_for(self, n: int) -> int:
        secs = next((s for s in self.buckets() if s * SR >= n),
                    self.buckets()[-1])
        return secs * SR

    def _decode_one(self, wav: np.ndarray) -> str:
        T = self._bucket_for(len(wav))
        padded = np.zeros((1, T), np.float32)
        padded[0, : len(wav)] = wav[:T]
        return self._decode_batch(padded, [min(len(wav), T)])[0]

    # --------------------------------------------------- micro-batching
    def _enqueue(self, wav: np.ndarray) -> dict:
        slot = {"event": threading.Event(), "wav": wav,
                "bucket": self._bucket_for(len(wav)), "text": None}
        with self._queue_cv:
            self._queue.append(slot)
            self._queue_cv.notify()
        return slot

    @staticmethod
    def _wait(slot: dict) -> str:
        slot["event"].wait()
        if "error" in slot:
            raise slot["error"]
        return slot["text"]

    def _batcher_loop(self):
        import time as _time

        while True:
            with self._queue_cv:
                while not self._queue:
                    self._queue_cv.wait()
                first = self._queue[0]
            # small collection window for co-arriving requests
            deadline = _time.monotonic() + self.batch_window_s
            while _time.monotonic() < deadline:
                with self._queue_cv:
                    same = [s for s in self._queue
                            if s["bucket"] == first["bucket"]]
                    if len(same) >= self.max_batch:
                        break
                _time.sleep(self.batch_window_s / 10)
            with self._queue_cv:
                group = [s for s in self._queue
                         if s["bucket"] == first["bucket"]][: self.max_batch]
                for s in group:
                    self._queue.remove(s)
            T = first["bucket"]
            # pad the row count to a warmed program size (1 or max_batch):
            # padded rows decode garbage that is never read back
            rows = 1 if len(group) == 1 else self.max_batch
            wavs = np.zeros((rows, T), np.float32)
            lengths = np.full((rows,), T, np.int64)
            for b, s in enumerate(group):
                w = s["wav"][:T]
                wavs[b, : len(w)] = w
                lengths[b] = len(w)
            try:
                texts = self._decode_batch(wavs, lengths, n_real=len(group))
                for b, s in enumerate(group):
                    s["text"] = texts[b]
            except Exception as e:  # noqa: BLE001 — deliver to the waiters
                for s in group:
                    s["error"] = e
            finally:
                for s in group:
                    s["event"].set()

    @staticmethod
    def _join_transcripts(texts, max_seam_words: int = 8) -> str:
        """Join chunk transcripts, deduplicating the window seam: the
        longest word suffix of the running transcript that exactly matches
        the next chunk's prefix (words re-decoded inside the overlap
        region) is dropped from the incoming chunk."""
        words: list = []
        for t in texts:
            w = t.split()
            if not w:
                continue
            k_max = min(max_seam_words, len(words), len(w))
            drop = 0
            for k in range(k_max, 0, -1):
                if words[-k:] == w[:k]:
                    drop = k
                    break
            words.extend(w[drop:])
        return " ".join(words)

    def transcribe(self, wav: np.ndarray) -> str:
        chunks = self._chunk(wav)
        if self.max_batch <= 1:
            texts = [self._decode_one(c) for c in chunks]
        else:
            # enqueue ALL windows before waiting: the collector coalesces
            # them into max_batch-sized programs instead of one per window
            slots = [self._enqueue(c) for c in chunks]
            texts = [self._wait(s) for s in slots]
        return self._join_transcripts(texts)

    def _synth_batch(self, toks: np.ndarray, n_real: int) -> list:
        """One device TTS program over ``toks`` [R, L]; returns the first
        ``n_real`` waveforms (padding rows synthesize silence, never read)."""
        jnp = self._jnp
        spk = np.zeros((toks.shape[0], self.cfg.spk_embed_dim), np.float32)
        with self.lock:
            out = self.tts.text_to_speech(jnp.asarray(toks),
                                          jnp.asarray(spk))
            if out.wav is None and not self.args.griffin_lim:
                raise RuntimeError(
                    "no vocoder loaded — start with --vocoder-ckpt "
                    "(a converted HiFi-GAN checkpoint) or --griffin-lim")
            if out.wav is not None:
                wavs = np.asarray(out.wav)
                wav_lens = np.asarray(out.wav_lengths)
            else:
                mels = np.asarray(out.mel)
                mel_lens = np.asarray(out.lengths)
            self.tts_calls += 1
            self.tts_requests += n_real
        if out.wav is not None:
            return [wavs[b, : int(wav_lens[b])] for b in range(n_real)]
        # checkpoint-free Griffin-Lim inversion on the host (outside the
        # device lock — numpy work must not serialize device programs)
        from ..ops.mel import mel_to_audio

        return [
            mel_to_audio(mels[b, : int(mel_lens[b])],
                         n_mels=self.cfg.n_mels)
            for b in range(n_real)
        ]

    def _tts_batcher_loop(self):
        """Coalesce concurrent /tts requests into one batched AR decode —
        the batched program amortizes the serial mel loop (batch-4 RTF is
        2.2x the batch-1 latency point, bench.py)."""
        import time as _time

        while True:
            with self._tts_cv:
                while not self._tts_queue:
                    self._tts_cv.wait()
            deadline = _time.monotonic() + self.batch_window_s
            while _time.monotonic() < deadline:
                with self._tts_cv:
                    if len(self._tts_queue) >= self.max_batch:
                        break
                _time.sleep(self.batch_window_s / 10)
            with self._tts_cv:
                group = self._tts_queue[: self.max_batch]
                del self._tts_queue[: len(group)]
            L = self.args.tts_bucket_tokens
            rows = 1 if len(group) == 1 else self.max_batch
            toks = np.full((rows, L), self.cfg.pad_id, np.int32)
            for b, s in enumerate(group):
                toks[b, : len(s["ids"])] = s["ids"]
            try:
                wavs = self._synth_batch(toks, n_real=len(group))
                for b, s in enumerate(group):
                    s["wav"] = wavs[b]
            except Exception as e:  # noqa: BLE001 — deliver to the waiters
                for s in group:
                    s["error"] = e
            finally:
                for s in group:
                    s["event"].set()

    def synthesize(self, text: str) -> np.ndarray:
        ids = self.dictionary.encode_line(
            " ".join(list(text.upper().replace(" ", "|"))))
        L = self.args.tts_bucket_tokens
        if len(ids) > L:
            raise RequestTooLarge(
                f"text tokenizes to {len(ids)} ids; --tts-bucket-tokens {L}"
            )
        if self.max_batch <= 1:
            toks = np.full((1, L), self.cfg.pad_id, np.int32)
            toks[0, : len(ids)] = ids
            return self._synth_batch(toks, n_real=1)[0]
        slot = {"event": threading.Event(), "ids": ids, "wav": None}
        with self._tts_cv:
            self._tts_queue.append(slot)
            self._tts_cv.notify()
        slot["event"].wait()
        if "error" in slot:
            raise slot["error"]
        return slot["wav"]


def make_handler(svc: Service):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True,
                    "asr": svc.asr is not None,
                    "tts": svc.tts is not None,
                    "asr_buckets_s": svc.buckets(),
                    "decoder": svc.args.decoder,
                    "max_batch": svc.max_batch,
                    "asr_calls": svc.asr_calls,
                    "asr_requests": svc.asr_requests,
                    "tts_calls": svc.tts_calls,
                    "tts_requests": svc.tts_requests,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                if self.path == "/asr":
                    if svc.asr is None:
                        return self._json(400, {"error": "asr not enabled"})
                    wav = _parse_wav(body)
                    return self._json(200, {"text": svc.transcribe(wav)})
                if self.path == "/tts":
                    if svc.tts is None:
                        return self._json(400, {"error": "tts not enabled"})
                    req = json.loads(body.decode())
                    wav = svc.synthesize(req["text"])
                    data = _wav_bytes(wav)
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                self._json(404, {"error": "not found"})
            except RequestTooLarge as e:
                self._json(413, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._json(500, {"error": repr(e)})

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", default="s2t", choices=("s2t", "t2s", "both"))
    p.add_argument("--arch", default="speecht5_base_asr")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--dict", dest="dict_path", required=True)
    p.add_argument("--vocoder-ckpt", default=None)
    p.add_argument("--griffin-lim", action="store_true",
                   help="/tts without a vocoder checkpoint: invert the mel "
                        "with Griffin-Lim on the host (ops/mel.mel_to_audio)"
                        " — lower fidelity than HiFi-GAN but zero artifacts")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--decoder", default="beam",
                   choices=("beam", "ctc_greedy", "ctc_rescore"),
                   help="/asr algorithm: joint CTC/attention beam search, "
                        "encoder-only CTC viterbi (17x throughput, "
                        "PERF.md §11), or two-pass CTC N-best + attention "
                        "rescore (§11b)")
    p.add_argument("--lexicon", default=None,
                   help="ctc_rescore: constrain pass-1 hypotheses to this "
                        "lexicon ('word<TAB>tok1 tok2 ...' lines)")
    p.add_argument("--lm-path", default=None,
                   help="ctc_rescore + --lexicon: word n-gram LM "
                        "(ARPA/.arpa.gz or prep lm-binary output)")
    p.add_argument("--lm-weight", type=float, default=0.0)
    p.add_argument("--word-score", type=float, default=0.0)
    p.add_argument("--rescore-nbest", type=int, default=8,
                   help="ctc_rescore: hypotheses per utterance kept for "
                        "the attention rescoring pass")
    p.add_argument("--ctc-topk", type=int, default=0,
                   help="ctc_rescore: per-frame candidate pruning of the "
                        "N-best prefix beam (0 = all)")
    p.add_argument("--ctc-beam-size", type=int, default=50,
                   help="ctc_rescore pass-1 beam width (open-vocabulary "
                        "or lexicon-constrained)")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max-len", type=int, default=200)
    p.add_argument("--ctc-weight", type=float, default=0.3)
    p.add_argument("--max-frames", type=int, default=1024)
    p.add_argument("--tts-bucket-tokens", type=int, default=128)
    p.add_argument("--asr-buckets", default=",".join(
        str(s) for s in ASR_BUCKETS_S))
    p.add_argument("--max-batch", type=int, default=1,
                   help="micro-batch up to N concurrent same-bucket /asr "
                        "requests into one device program (compiles batch "
                        "sizes 1 and N per bucket at startup)")
    p.add_argument("--batch-window-ms", type=float, default=20.0,
                   help="how long the collector waits for co-arriving "
                        "requests before launching a partial batch")
    p.add_argument("--chunk-overlap-s", type=float, default=0.5,
                   help="overlap between decode windows when audio exceeds "
                        "the largest bucket (chunked, never truncated)")
    p.add_argument("--max-audio-s", type=float, default=120.0,
                   help="hard cap on /asr audio length -> HTTP 413 "
                        "(0 disables)")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)
    if args.lm_path and not args.lexicon:
        p.error("--lm-path requires --lexicon (the word n-gram LM scores "
                "lexicon words; without a lexicon it would be silently "
                "ignored)")

    svc = Service(args)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(svc))
    print(json.dumps({"serving": True, "host": args.host,
                      "port": server.server_address[1]}), flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
