#!/usr/bin/env python
"""Prosody-SpeechT5 expressive TTS: style learning + prosody transfer.

Runnable tiny demonstration of the family the reference advertises with no
code (reference README.md:17,24-28; paper-level reconstruction, arXiv
2211.11275 — models/prosody.py):

1. a two-style corpus renders the SAME text to mel = pattern + style
   offset (style A: +1.5, style B: -1.5).  Text alone cannot resolve the
   ambiguity — only the prosody embedding can;
2. trains forward_t2s (TTS L1 + stop + prosody-predictor distillation);
3. gates: conditioning the decoder on an A-style reference produces
   positive-mean mel and a B-style reference negative-mean — prosody
   TRANSFER controls the output;
4. prosody embeddings cluster by style (same-style < cross-style dist).

Usage: python recipes/prosody_tts.py [--steps N]
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

    from speecht5_tpu.config import speecht5_tiny
    from speecht5_tpu.models.prosody import (
        ProsodyConfig, init_prosody_speecht5,
    )
    from speecht5_tpu.train import criterions

    cfg = speecht5_tiny()
    pcfg = ProsodyConfig(dim=8, conv_channels=16, n_convs=2,
                         predictor_hidden=32)
    model, variables = init_prosody_speecht5(
        cfg, jax.random.PRNGKey(args.seed), pcfg)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    # two styles, same text: mel = shared pattern + style offset
    B, L, MEL = 8, 5, 16
    r = cfg.reduction_factor
    rng = np.random.default_rng(args.seed)
    tokens = np.tile(np.asarray([[5, 6, 7, 8, 2]], np.int32), (B, 1))
    t = np.arange(MEL)[:, None]
    pattern = 0.5 * np.sin(0.7 * t + np.arange(cfg.n_mels)[None, :] * 0.3)
    style = np.asarray([+1.5 if b % 2 == 0 else -1.5 for b in range(B)],
                       np.float32)
    target = (pattern[None] + style[:, None, None]
              + 0.05 * rng.standard_normal((B, MEL, cfg.n_mels))
              ).astype(np.float32)
    thin = target[:, r - 1 :: r]
    prev = np.concatenate(
        [np.zeros_like(thin[:, :1]), thin[:, :-1]], axis=1)
    spk = np.zeros((B, cfg.spk_embed_dim), np.float32)

    toks_j = jnp.asarray(tokens)
    prev_j = jnp.asarray(prev)
    tgt_j = jnp.asarray(target)
    dec_len = jnp.full((B,), MEL, jnp.int32)
    spk_j = jnp.asarray(spk)

    def loss_fn(p, rng_key):
        vs = {"params": p, **extra}
        out, updates = model.apply(
            vs, toks_j, prev_j, dec_len // r, spk_j, tgt_j, dec_len,
            deterministic=False, method="forward_t2s",
            rngs={"prenet": rng_key, "dropout": jax.random.fold_in(rng_key, 1)},
            mutable=["batch_stats"],
        )
        before, after, stop, attn, pred_loss = out
        tts, metrics = criterions.tts_loss(
            before, after, stop, tgt_j, dec_len,
            reduction_factor=r,
        )
        return tts + pcfg.pred_loss_weight * pred_loss, (
            metrics, pred_loss, updates)

    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(p, o, key):
        (loss, (m, pl, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, key)
        upd, o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss, pl

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    first = None
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, pred_loss = train_step(
            params, opt_state, sub)
        if first is None:
            first = float(loss)
        if (step + 1) % 100 == 0:
            print(json.dumps({"step": step + 1,
                              "loss": round(float(loss), 4),
                              "pred_loss": round(float(pred_loss), 4)}),
                  flush=True)
    assert float(loss) < first / 4, (first, float(loss))

    vs = {"params": params, **extra}

    # --- prosody embeddings cluster by style
    emb = np.asarray(model.apply(vs, tgt_j, dec_len,
                                 method="prosody_embedding"))
    a, b = emb[0::2], emb[1::2]
    d_same = (np.linalg.norm(a - a.mean(0), axis=1).mean()
              + np.linalg.norm(b - b.mean(0), axis=1).mean())
    d_cross = np.linalg.norm(a.mean(0) - b.mean(0))
    assert d_cross > 2 * d_same, (d_same, d_cross)

    # --- prosody TRANSFER controls the output: same text + same decoder
    # input, conditioned on an A-ref vs a B-ref -> opposite-sign mel
    def teacher_mel(ref_idx):
        enc = model.apply(vs, toks_j[:1], tgt_j[ref_idx : ref_idx + 1],
                          dec_len[:1], method="encode_text_ref")
        before, after, stop, attn = model.apply(
            vs, enc, prev_j[:1] * 0.0, dec_len[:1] // r, spk_j[:1],
            deterministic=True, need_attn=True,
            method="decode_speech",
            rngs={"prenet": jax.random.PRNGKey(9)},
        )
        return float(np.asarray(after).mean())

    mean_a = teacher_mel(0)   # style A reference (+1.5)
    mean_b = teacher_mel(1)   # style B reference (-1.5)
    assert mean_a > 0.5 and mean_b < -0.5, (mean_a, mean_b)

    print(json.dumps({
        "done": True, "steps": args.steps,
        "loss_first": round(first, 3), "loss_last": round(float(loss), 4),
        "pred_loss_last": round(float(pred_loss), 4),
        "style_cluster_ratio": round(float(d_cross / max(d_same, 1e-9)), 2),
        "transfer_mel_mean_a": round(mean_a, 3),
        "transfer_mel_mean_b": round(mean_b, 3),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
