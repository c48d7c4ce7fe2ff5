#!/usr/bin/env python
"""Speech2S end-to-end S2ST chain: speech -> unit decode -> unit vocoder -> wav.

Runnable tiny demonstration of the chain the reference's Speech2S project
exists for (reference Speech2S/speech2s/stpretrain_scripts/
decode_text2code_beam2.sh decodes speech to unit sequences with a beam
decoder; eval2.sh feeds them to a unit HiFi-GAN for waveform synthesis):

1. trains a tiny SpeechUT-substrate model (Speech2S's core is byte-identical
   to SpeechUT upstream) to map phone-coded source speech to reduced unit
   sequences (decoder CE over the unit vocabulary — "text2code");
2. beam-decodes units with the shared jitted ASRDecoder;
3. synthesizes a waveform with the unit-conditioned CodeHiFiGAN
   (models/hifigan.py: embedding + duration re-expansion + generator).

Usage: python recipes/speech2s_s2st.py [--steps N]
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
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from speecht5_tpu.models.speechut import SpeechUTModel, speechut_tiny
    from speecht5_tpu.decode.asr import ASRDecoder
    from speecht5_tpu.models.hifigan import (
        CodeHiFiGAN, CodeHiFiGANConfig, HiFiGANConfig,
    )
    from speecht5_tpu.data.audio import write_wav

    # decoder vocabulary IS the unit vocabulary ("text2code"): specials 0-3
    # plus <ctc_blank>=4 (suppressed by the beam decoder), units 5..U+4
    N_UNITS = 8
    UNIT0 = 5
    cfg = speechut_tiny(text_vocab_size=UNIT0 + N_UNITS)
    model = SpeechUTModel(cfg)

    # phone-coded source speech: each utterance = LP sine bursts, burst i at
    # a phone-keyed frequency; target = the phone sequence as reduced units
    B, LP, SEG = 8, 4, 2000
    rng = np.random.default_rng(args.seed)
    phones = rng.integers(0, N_UNITS, (B, LP))
    wavs = np.zeros((B, LP * SEG), np.float32)
    t = np.arange(SEG) / 16000.0
    for b in range(B):
        for i, ph in enumerate(phones[b]):
            wavs[b, i * SEG : (i + 1) * SEG] = 0.3 * np.sin(
                2 * np.pi * (220.0 + 130.0 * ph) * t
            )
    units = phones + UNIT0                              # [B, LP]
    targets = np.concatenate(
        [units, np.full((B, 1), cfg.eos_id)], axis=1
    ).astype(np.int32)
    prev = np.concatenate(
        [np.full((B, 1), cfg.eos_id), units], axis=1
    ).astype(np.int32)

    wav_j = jnp.asarray(wavs)
    wlen_j = jnp.full((B,), wavs.shape[1], jnp.int32)
    prev_j, tgt_j = jnp.asarray(prev), jnp.asarray(targets)

    # init_all wants FRAME-level units (the pretraining targets); any ids do
    T_frames = int(cfg.conv_features.out_length(wavs.shape[1]))
    frame_units = jnp.full((B, T_frames), 4, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "mask": jax.random.PRNGKey(1), "mix": jax.random.PRNGKey(2)},
        wav_j, wlen_j, frame_units, prev_j, method="init_all",
    )
    params = variables["params"]

    def loss_fn(p):
        enc = model.apply({"params": p}, wav_j, wlen_j,
                          method="encode_speech")
        logits = model.apply({"params": p}, enc, prev_j,
                             method="decode_text")
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, tgt_j[..., None], -1)[..., 0]
        return nll.mean()

    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    t0 = time.time()
    first = None
    for step in range(args.steps):
        params, opt_state, loss = train_step(params, opt_state)
        if first is None:
            first = float(loss)
        if (step + 1) % 50 == 0:
            print(json.dumps({"step": step + 1,
                              "unit_nll": round(float(loss), 4)}), flush=True)
    assert float(loss) < first / 10, (first, float(loss))

    # --- speech -> units: the shared jitted beam decoder over unit vocab
    dec = ASRDecoder(model, {"params": params}, beam_size=2,
                     max_len=LP + 2)
    res = dec(wav_j, wlen_j)
    toks = np.asarray(res.tokens)[:, 0]
    lens = np.asarray(res.lengths)[:, 0]
    hyp_units = [toks[b, 1 : lens[b] - 1].tolist() for b in range(B)]
    want_units = [units[b].tolist() for b in range(B)]
    acc = float(np.mean([h == w for h, w in zip(hyp_units, want_units)]))
    assert acc == 1.0, f"unit decode exact-match {acc}: {hyp_units[:2]}"

    # --- units -> waveform: CodeHiFiGAN with duration re-expansion
    vcfg = CodeHiFiGANConfig(
        num_units=UNIT0 + N_UNITS, embed_dim=32, dur_predictor=True,
        max_duration=4,
        generator=HiFiGANConfig(
            in_dim=32, upsample_initial_channel=64,
            upsample_rates=(5, 4, 4, 4), upsample_kernel_sizes=(11, 8, 8, 8),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
            normalize_before=False,
        ),
    )
    voc = CodeHiFiGAN(vcfg)
    u = jnp.asarray([hyp_units[0]], jnp.int32)
    voc_vars = voc.init(jax.random.PRNGKey(2), u)
    wav_out = np.asarray(jax.jit(voc.apply)(voc_vars, u))
    hop = int(np.prod(vcfg.generator.upsample_rates))
    assert wav_out.shape == (1, len(hyp_units[0]) * vcfg.max_duration * hop)
    assert np.isfinite(wav_out).all()
    write_wav("speech2s_s2st.wav",
              wav_out[0] / max(1e-6, np.abs(wav_out).max()))

    print(json.dumps({
        "done": True, "steps": args.steps,
        "unit_nll_first": round(first, 3), "unit_nll_last": round(float(loss), 4),
        "unit_decode_exact_match": acc,
        "wav": "speech2s_s2st.wav", "wav_samples": int(wav_out.shape[-1]),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
