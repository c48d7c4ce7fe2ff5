#!/usr/bin/env python
"""SpeechUT joint pretraining: MultiCorpusLoader + make_speechut_joint_loss.

Runnable end-to-end example (tiny config, synthetic corpora) of the
SpeechUT/Speech2S pretraining recipe: every optimizer update consumes a
heterogeneous {speech, text_mono, text_paired} sample (reference
SpeechUT/speechut/criterions/speechut_criterion.py:166-265, data side
SpeechLM/speechlm/data/multimodal_corpus_dataset.py:24). Swap the synthetic
datasets for manifest-backed ones (speecht5_tpu.data.manifests) for real runs.

Usage: python recipes/speechut_joint_pretrain.py [--steps N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from speecht5_tpu.models.speechut import SpeechUTModel, speechut_tiny
    from speecht5_tpu.train.joint import JointLossConfig, make_speechut_joint_loss
    from speecht5_tpu.data.multicorpus import MultiCorpusLoader, TokenCorpusSpec

    cfg = speechut_tiny()
    model = SpeechUTModel(cfg)
    rng = np.random.default_rng(args.seed)

    # --- synthetic corpora (stand-ins for manifest-backed datasets) ---------
    T_WAV, B_SP, B_PAIR, B_MONO = 4000, 2, 2, 2
    frames = cfg.conv_features.out_length(T_WAV)

    def speech_item(i):
        return {
            "wav": rng.standard_normal(T_WAV).astype(np.float32) * 0.1,
            "units": rng.integers(2, cfg.unit_vocab_size, frames, np.int64),
        }

    def paired_item(i):
        return {
            "units": rng.integers(2, cfg.unit_vocab_size, 10, np.int64),
            "targets": rng.integers(5, cfg.text_vocab_size, 6, np.int64),
        }

    def mono_item(i):
        return {"units": rng.integers(2, cfg.unit_vocab_size, 12, np.int64)}

    speech_ds = [speech_item(i) for i in range(16)]
    paired_ds = [paired_item(i) for i in range(10)]
    mono_ds = [mono_item(i) for i in range(12)]

    def collate_speech(items):
        return {
            "wav": jnp.stack([jnp.asarray(x["wav"]) for x in items]),
            "wav_lengths": jnp.full((len(items),), T_WAV, jnp.int32),
            "units": jnp.stack(
                [jnp.asarray(x["units"], jnp.int32) for x in items]),
        }

    def collate_paired(items):
        tgt = jnp.stack([jnp.asarray(x["targets"], jnp.int32) for x in items])
        prev = jnp.concatenate(
            [jnp.full((len(items), 1), cfg.eos_id, jnp.int32), tgt[:, :-1]], 1)
        return {
            "units": jnp.stack(
                [jnp.asarray(x["units"], jnp.int32) for x in items]),
            "prev_tokens": prev,
            "targets": tgt,
        }

    def collate_mono(items):
        return {"units": jnp.stack(
            [jnp.asarray(x["units"], jnp.int32) for x in items])}

    # reference-faithful sampling: per-epoch instance counts follow
    # sample_ratio * total, text corpora batch under a scaled token budget
    # (reference multimodal_corpus_dataset.py:77-150,387-416 semantics;
    # tasks/joint_sc2t_pretrain.py:902-925 sets text budgets ~1/320 of the
    # speech sample budget).  The synthetic items are fixed-length, so these
    # budgets yield the same static batch shapes (2, 2, 2) every step.
    total = len(speech_ds) + len(paired_ds) + len(mono_ds)
    loader = MultiCorpusLoader([
        TokenCorpusSpec("speech", speech_ds, collate_speech,
                        np.full(len(speech_ds), T_WAV),
                        sample_ratio=len(speech_ds) / total),
        TokenCorpusSpec("text_paired", paired_ds, collate_paired,
                        np.full(len(paired_ds), 10),
                        sample_ratio=len(paired_ds) / total,
                        max_tokens_ratio=(10 * B_PAIR) / (T_WAV * B_SP)),
        TokenCorpusSpec("text_mono", mono_ds, collate_mono,
                        np.full(len(mono_ds), 12),
                        sample_ratio=len(mono_ds) / total,
                        max_tokens_ratio=(12 * B_MONO) / (T_WAV * B_SP)),
    ], max_tokens=T_WAV * B_SP, seed=args.seed)

    # --- model + jitted joint step ------------------------------------------
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    wav0 = jnp.zeros((B_SP, T_WAV))
    variables = jax.jit(lambda: model.init(
        rngs, wav0, jnp.full((B_SP,), T_WAV), jnp.zeros(
            (B_SP, frames), jnp.int32),
        jnp.full((B_PAIR, 6), cfg.eos_id, jnp.int32), method="init_all"))()

    jcfg = JointLossConfig(
        u2t_ed_weight=0.1, u2t_ctc_weight=0.1, text_mum_weight=0.5)
    loss_fn = make_speechut_joint_loss(model, jcfg)
    tx = optax.adamw(args.lr)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, step_rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, step_rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    key = jax.random.PRNGKey(args.seed + 7)
    step, epoch = 0, 0
    t0 = time.time()
    while step < args.steps:
        for _, joint in loader.iter_epoch(epoch):
            key, sub = jax.random.split(key)
            params, opt_state, loss, metrics = train_step(
                params, opt_state, joint, sub)
            step += 1
            print(json.dumps({
                "step": step,
                "loss": round(float(loss), 4),
                **{k: round(float(v), 4) for k, v in metrics.items()
                   if k.endswith("loss") or "loss_m" in k},
            }), flush=True)
            if step >= args.steps:
                break
        epoch += 1
    print(f"done: {args.steps} steps in {time.time()-t0:.1f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
