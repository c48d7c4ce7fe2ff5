#!/usr/bin/env python
"""VALL-E X zero-shot TTS: AR + NAR codec-LM training and synthesis.

Runnable end-to-end example (tiny config, synthetic codec corpus) of the
VALL-E X recipe (paper-only in the reference — root README.md:24 advertises
it with no code in-tree; built from the paper on this repo's shared decoder
substrate, models/vallex.py):

1. trains the AR stage (first-codebook LM over phoneme+acoustic-prompt
   context) and the NAR stage (codebooks 2..K conditioned on stage
   embedding) on phoneme-keyed synthetic EnCodec-style token sequences;
2. synthesizes: AR generates codebook 1 until EOS, NAR fills the remaining
   codebooks; asserts the generated codes recover the learned mapping.

Usage: python recipes/vallex_tts.py [--steps N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from speecht5_tpu.models.vallex import vallex_tiny, init_vallex

    cfg = vallex_tiny()
    model, variables = init_vallex(cfg, jax.random.PRNGKey(args.seed))
    params = variables["params"]

    # deterministic phoneme->code mapping: code_k[t] = (phoneme[t] + k) % C
    # over a repeating phoneme pattern — learnable by both stages
    B, LP, LC = 4, 6, 8
    rng = np.random.default_rng(args.seed)
    phonemes = np.stack([
        rng.permutation(np.arange(3, 3 + LP)) for _ in range(B)
    ]).astype(np.int32)
    codes = np.zeros((B, cfg.n_codebooks, LC), np.int32)
    for b in range(B):
        for t in range(LC):
            ph = phonemes[b, t % LP]
            for k in range(cfg.n_codebooks):
                codes[b, k, t] = (ph * 3 + k) % cfg.codebook_size
    phonemes_j = jnp.asarray(phonemes)
    codes_j = jnp.asarray(codes)
    bos = jnp.full((B, 1), cfg.codebook_size + 1, jnp.int32)
    prev = jnp.concatenate([bos, codes_j[:, 0, :-1]], axis=1)

    def loss_fn(p, stage):
        ar_logits = model.apply({"params": p}, phonemes_j, prev,
                                method="forward_ar")
        lp = jax.nn.log_softmax(ar_logits, axis=-1)
        ar = -jnp.take_along_axis(lp, codes_j[:, 0][..., None], -1).mean()
        nar_logits = model.apply({"params": p}, phonemes_j, codes_j, stage,
                                 method="forward_nar")
        lp2 = jax.nn.log_softmax(nar_logits, axis=-1)
        nar = -jnp.take_along_axis(
            lp2, codes_j[:, stage][..., None], -1).mean()
        return ar + nar, {"ar_nll": ar, "nar_nll": nar}

    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    from functools import partial

    @partial(jax.jit, static_argnames=("stage",))
    def train_step(p, o, stage):
        (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, stage)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, m

    t0 = time.time()
    first = None
    for step in range(args.steps):
        stage = int(1 + step % (cfg.n_codebooks - 1))  # rotate NAR stages
        params, opt_state, loss, m = train_step(params, opt_state, stage)
        if first is None:
            first = {k: float(v) for k, v in m.items()}
        if (step + 1) % 50 == 0:
            print(json.dumps({"step": step + 1, **{
                k: round(float(v), 4) for k, v in m.items()}}), flush=True)
    last = {k: float(v) for k, v in m.items()}
    assert last["ar_nll"] < first["ar_nll"] / 4, (first, last)
    assert last["nar_nll"] < first["nar_nll"] / 4, (first, last)

    # --- synthesis: acoustic prompt = first 2 frames, AR continues, NAR
    # fills the remaining codebooks (paper's inference procedure)
    prompt = codes_j[:1, :, :2]
    gen, n_new = model.apply(
        {"params": params}, phonemes_j[:1], prompt, max_new=LC - 2,
        method="synthesize",
    )
    gen = np.asarray(gen)  # [1, K, max_new]: the CONTINUATION after the prompt
    want = codes[0, :, 2 : 2 + gen.shape[-1]]
    acc = float((gen[0] == want).mean())
    assert acc > 0.9, f"synthesis diverged from the learned mapping: {acc}"

    # --- codec decode: RVQ tokens -> waveform through the native EnCodec
    # decoder (models/encodec.py) — the stage the reference defers to an
    # external torch EnCodec.  Prompt + continuation decode as one stream.
    from speecht5_tpu.models.encodec import EncodecConfig, init_encodec
    from speecht5_tpu.data.audio import write_wav

    ccfg = EncodecConfig(
        num_filters=4, hidden_size=8, codebook_size=cfg.codebook_size,
        num_quantizers=cfg.n_codebooks, upsampling_ratios=(4, 2),
        num_lstm_layers=1, sampling_rate=16000,
    )
    codec, codec_vars = init_encodec(ccfg, jax.random.PRNGKey(7))
    full = np.concatenate([np.asarray(prompt), gen], axis=-1)
    wav = np.asarray(jax.jit(
        lambda v, c: codec.apply(v, c, method="decode_codes")
    )(codec_vars, jnp.asarray(full)))
    assert wav.shape == (1, full.shape[-1] * ccfg.hop_length)
    assert np.isfinite(wav).all()
    write_wav("vallex_tts.wav", wav[0] / max(1e-6, np.abs(wav).max()),
              sr=ccfg.sampling_rate)

    print(json.dumps({"done": True, "steps": args.steps,
                      "ar_nll": round(last["ar_nll"], 4),
                      "nar_nll": round(last["nar_nll"], 4),
                      "synthesis_code_accuracy": round(acc, 3),
                      "wav": "vallex_tts.wav",
                      "wav_samples": int(wav.shape[-1]),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
