#!/usr/bin/env python
"""Speech2C pretraining: HuBERT masked prediction + code seq2seq decoder.

Runnable end-to-end example (tiny config, synthetic corpus) of the Speech2C
recipe: one update = HuBERT masked CE over km labels PLUS cross-entropy on
the decoder predicting the deduplicated code sequence (reference
Speech2C/speech2c/models/speech2c.py:111 + criterions/
speech2c_criterion.py:42-120).  Asserts both loss terms fall.  Swap the
synthetic data for manifest-backed SpeechPretrainDataset (+ decoder code
targets) for real runs.

Usage: python recipes/speech2c_pretrain.py [--steps N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from speecht5_tpu.config import speecht5_tiny
    from speecht5_tpu.models.speech2c import Speech2CModel
    from speecht5_tpu.train.criterions import hubert_loss, label_smoothed_ce

    cfg = speecht5_tiny()
    model = Speech2CModel(cfg)
    B, T_WAV = 4, 4000
    frames = cfg.conv_features.out_length(T_WAV)
    rng = np.random.default_rng(args.seed)

    # km labels follow a tone signature; the decoder's code targets are the
    # run-length-deduplicated label sequence (speech2c_dataset.py:19)
    n_km = 8
    km = rng.integers(0, n_km, (B, frames)).astype(np.int32)
    wav = np.zeros((B, T_WAV), np.float32)
    t = np.arange(T_WAV) / 16000.0
    hop = T_WAV // frames
    for b in range(B):
        for f in range(frames):
            freq = 120.0 * (1 + int(km[b, f]))
            wav[b, f * hop : (f + 1) * hop] = 0.2 * np.sin(
                2 * np.pi * freq * t[: hop])

    def dedup(row, max_len):
        out = [row[0]]
        for x in row[1:]:
            if x != out[-1]:
                out.append(x)
        out = (out + [cfg.eos_id])[:max_len]
        return np.pad(np.asarray(out, np.int32), (0, max_len - len(out)),
                      constant_values=cfg.pad_id)

    LC = 24
    codes = np.stack([dedup((km[b] + 4).tolist(), LC) for b in range(B)])
    prev = np.full_like(codes, cfg.pad_id)
    prev[:, 0] = cfg.eos_id
    prev[:, 1:] = codes[:, :-1]

    wav = jnp.asarray(wav)
    lengths = jnp.full((B,), T_WAV, jnp.int32)
    km_j = jnp.asarray(km)
    codes_j, prev_j = jnp.asarray(codes), jnp.asarray(prev)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        wav, lengths, prev_j, method="init_all",
    )
    params = variables["params"]
    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    def loss_fn(p, step_rng):
        out = model.apply(
            {"params": p}, wav, lengths, prev_j,
            rngs={"mask": step_rng, "dropout": step_rng},
            deterministic=False, method="forward_pretrain",
        )
        hub, hub_m = hubert_loss(
            out["hubert_logits"], [km_j], out["time_mask"],
            out["valid_mask"],
        )
        dec, dec_nll = label_smoothed_ce(
            out["dec_logits"], codes_j, codes_j != cfg.pad_id, eps=0.0,
        )
        return hub + dec, {"hubert": hub, "dec_ce": dec_nll}

    @jax.jit
    def train_step(p, o, step_rng):
        (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, step_rng)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, m

    key = jax.random.PRNGKey(args.seed + 7)
    t0 = time.time()
    first = None
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, m = train_step(params, opt_state, sub)
        if first is None:
            first = {k: float(v) for k, v in m.items()}
        if (step + 1) % 40 == 0:
            print(json.dumps({"step": step + 1, **{
                k: round(float(v), 4) for k, v in m.items()}}), flush=True)
    last = {k: float(v) for k, v in m.items()}
    assert last["hubert"] < first["hubert"], (first, last)
    assert last["dec_ce"] < first["dec_ce"] / 2, (first, last)
    print(json.dumps({"done": True, "steps": args.steps,
                      "first": {k: round(v, 3) for k, v in first.items()},
                      "last": {k: round(v, 3) for k, v in last.items()},
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
