#!/usr/bin/env python
"""SpeechLM CTC ASR fine-tune: SpeechLMCtc + pure-JAX CTC loss.

Runnable end-to-end example (tiny config, synthetic tone corpus) of the
SpeechLM ASR recipe: encoder stack -> CTC head -> greedy (viterbi) decode
(reference SpeechLM/speechlm/models/speechlm_ctcasr.py:22-56 +
config/finetune/speechlm_base_100h.yaml; decode side speechlm/infer.py).
Overfits 8 tone-keyed utterances to UER 0 in ~300 steps (~60 s on one
CPU core); the real recipe starts from a PRETRAINED encoder — swap the
synthetic dataset for manifest-backed SpeechToTextDataset + a converted
checkpoint for real runs.

Usage: python recipes/speechlm_ctc_finetune.py [--steps N]
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
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from speecht5_tpu.models.speechlm import SpeechLMCtc, speechlm_tiny
    from speecht5_tpu.ops.ctc import ctc_loss

    BLANK, V = 0, 8          # ids 2..7 are "letters"
    B, T_WAV, L = 8, 4000, 4
    cfg = speechlm_tiny()
    model = SpeechLMCtc(cfg, ctc_vocab_size=V)

    # --- synthetic learnable corpus: each letter id keyed to a tone -------
    rng = np.random.default_rng(args.seed)

    def sample(i):
        labels = rng.integers(2, V, (L,))
        t = np.arange(T_WAV) / 16000.0
        wav = np.zeros(T_WAV, np.float32)
        seg = T_WAV // L
        for j, lab in enumerate(labels):
            f = 150.0 * (1 + int(lab))
            wav[j * seg : (j + 1) * seg] = 0.3 * np.sin(
                2 * np.pi * f * t[: seg])
        wav += 0.01 * rng.standard_normal(T_WAV).astype(np.float32)
        return wav.astype(np.float32), labels.astype(np.int32)

    data = [sample(i) for i in range(B)]  # fixed set: overfit demo

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        jnp.zeros((B, T_WAV)), jnp.full((B,), T_WAV),
    )
    params = variables["params"]
    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    def loss_fn(params, wav, labels, rng):
        logits, valid = model.apply(
            {"params": params}, wav, jnp.full((B,), T_WAV),
            deterministic=False, rngs={"dropout": rng, "mask": rng},
        )
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = ctc_loss(
            lp, valid.sum(-1).astype(jnp.int32), labels,
            jnp.full((B,), L, jnp.int32), blank_id=BLANK,
        )
        return nll.mean()

    @jax.jit
    def train_step(params, opt_state, wav, labels, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, wav, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed + 7)
    t0 = time.time()
    wav = jnp.asarray(np.stack([d[0] for d in data]))
    labels = jnp.asarray(np.stack([d[1] for d in data]))
    loss0 = None
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, wav, labels, sub)
        if loss0 is None:
            loss0 = float(loss)
        if (step + 1) % 50 == 0:
            print(json.dumps({"step": step + 1,
                              "ctc_loss": round(float(loss), 4)}), flush=True)

    # --- greedy CTC decode (viterbi, lm_weight 0) over the train set ------
    from speecht5_tpu.utils.metrics import edit_distance

    err = tot = 0
    for s in range(0, len(data), B):
        wav = jnp.asarray(np.stack([d[0] for d in data[s : s + B]]))
        logits, valid = model.apply(
            {"params": params}, wav, jnp.full((B,), T_WAV))
        ids = np.asarray(jnp.argmax(logits, -1))
        lens = np.asarray(valid.sum(-1))
        for b in range(ids.shape[0]):
            seq = ids[b, : lens[b]]
            if len(seq):
                seq = seq[np.concatenate([[True], seq[1:] != seq[:-1]])]
            seq = seq[seq != BLANK]
            ref = data[s + b][1].tolist()
            err += edit_distance(seq.tolist(), ref)
            tot += len(ref)
    uer = err / max(tot, 1)
    assert float(loss) < loss0 / 10, (loss0, float(loss))
    assert uer < 0.1, f"toy overfit UER too high: {uer}"
    print(json.dumps({"done": True, "steps": args.steps,
                      "ctc_loss_first": round(loss0, 2),
                      "ctc_loss_last": round(float(loss), 4),
                      "uer": round(uer, 4),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
