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
- device access is serialized with a lock — one program in flight, the
  jitted batch path stays available for offline throughput;
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
        if args.task in ("s2t", "both"):
            from ..decode.asr import ASRDecoder

            self.asr = ASRDecoder(
                model, self.variables, beam_size=args.beam,
                max_len=args.max_len, ctc_weight=args.ctc_weight,
            )
            for secs in self.buckets():
                wav = jnp.zeros((1, secs * SR), jnp.float32)
                res = self.asr(wav, jnp.full((1,), secs * SR, jnp.int32))
                jax.block_until_ready(res.tokens)
                print(f"warmed ASR bucket {secs}s", flush=True)
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
            toks = jnp.full((1, args.tts_bucket_tokens), cfg.eos_id,
                            jnp.int32)
            spk = jnp.zeros((1, cfg.spk_embed_dim), jnp.float32)
            out = self.tts.text_to_speech(toks, spk)
            jax.block_until_ready(out.mel)
            print("warmed TTS", flush=True)

    def buckets(self):
        return [int(s) for s in self.args.asr_buckets.split(",")]

    # ------------------------------------------------------------------ ops
    def transcribe(self, wav: np.ndarray) -> str:
        jnp = self._jnp
        n = len(wav)
        secs = next((s for s in self.buckets() if s * SR >= n),
                    self.buckets()[-1])
        T = secs * SR
        wav = wav[:T]
        padded = np.zeros((1, T), np.float32)
        padded[0, : len(wav)] = wav
        with self.lock:
            res = self.asr(jnp.asarray(padded),
                           jnp.full((1,), len(wav), jnp.int32))
            toks = np.asarray(res.tokens)[0, 0]
            length = int(np.asarray(res.lengths)[0, 0])
        hyp_ids = toks[1 : max(length - 1, 1)]
        return self._letters_to_text(self.dictionary.string(hyp_ids))

    def synthesize(self, text: str) -> np.ndarray:
        jnp = self._jnp
        cfg = self.cfg
        ids = self.dictionary.encode_line(
            " ".join(list(text.upper().replace(" ", "|"))))
        L = self.args.tts_bucket_tokens
        toks = np.full((1, L), cfg.pad_id, np.int32)
        toks[0, : min(len(ids), L)] = ids[:L]
        spk = np.zeros((1, cfg.spk_embed_dim), np.float32)
        with self.lock:
            out = self.tts.text_to_speech(jnp.asarray(toks),
                                          jnp.asarray(spk))
            if out.wav is None:
                raise RuntimeError(
                    "no vocoder loaded — start with --vocoder-ckpt "
                    "(a converted HiFi-GAN checkpoint)")
            n = int(np.asarray(out.wav_lengths)[0])
            return np.asarray(out.wav)[0, :n]


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
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max-len", type=int, default=200)
    p.add_argument("--ctc-weight", type=float, default=0.3)
    p.add_argument("--max-frames", type=int, default=1024)
    p.add_argument("--tts-bucket-tokens", type=int, default=128)
    p.add_argument("--asr-buckets", default=",".join(
        str(s) for s in ASR_BUCKETS_S))
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    svc = Service(args)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(svc))
    print(json.dumps({"serving": True, "host": args.host,
                      "port": server.server_address[1]}), flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
