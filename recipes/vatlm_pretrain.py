#!/usr/bin/env python
"""VATLM tri-modal pretraining: audio+video+phone masked prediction.

Runnable end-to-end example (tiny config, synthetic corpus) of the VATLM
recipe: every update sees audio-visual, audio-only and text(phone)-only
sub-batches through ONE model with per-modality frontends + masked
prediction over km labels (reference VATLM/vat_hubert/vathubert/models/
vathubert.py:338 + vathubert_criterion.py:45; data mixing
vathubert_pretraining.py:216).  Asserts the masked-prediction loss falls
for every modality stream.  Swap the synthetic tensors for
data/vatlm.py-backed manifests for real runs.

Usage: python recipes/vatlm_pretrain.py [--steps N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from speecht5_tpu.models.vatlm import VATLMModel, vatlm_tiny
    from speecht5_tpu.train.criterions import hubert_loss

    cfg = vatlm_tiny()
    model = VATLMModel(cfg)
    B, T = 2, 16
    rng = np.random.default_rng(args.seed)

    # labels keyed into the audio features so masked prediction is learnable
    km = rng.integers(0, cfg.num_classes[0], (B, T)).astype(np.int32)
    audio = np.zeros((B, T, cfg.audio_feat_dim), np.float32)
    for b in range(B):
        for f in range(T):
            audio[b, f, int(km[b, f]) % cfg.audio_feat_dim] = 1.0
    audio += 0.05 * rng.standard_normal(audio.shape).astype(np.float32)
    video = jnp.asarray(
        rng.standard_normal((B, T, cfg.video_size, cfg.video_size, 1)),
        jnp.float32) * 0.1
    phones = jnp.asarray(rng.integers(4, 12, (B, T)), jnp.int32)
    audio = jnp.asarray(audio)
    lengths = jnp.full((B,), T, jnp.int32)
    km_j = jnp.asarray(km)
    prev = jnp.full((B, 5), cfg.eos_id, jnp.int32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
         "modality": jax.random.PRNGKey(2)},
        audio, video, lengths, phones, prev, method="init_all",
    )
    params, batch_stats = variables["params"], variables.get("batch_stats")

    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    # the three modality streams of one VATLM update
    STREAMS = (
        ("av", dict(video=True, phone=False)),
        ("audio_only", dict(video=False, phone=False)),
        ("phone", dict(video=False, phone=True)),
    )

    def loss_fn(p, bs, step_rng):
        total = 0.0
        metrics = {}
        new_bs = bs
        for name, spec in STREAMS:
            out, mut = model.apply(
                {"params": p, **({"batch_stats": new_bs} if new_bs else {})},
                audio if name != "phone" else None,
                video if spec["video"] else None,
                lengths,
                phone_tokens=phones if spec["phone"] else None,
                mask=True, deterministic=False,
                rngs={"mask": jax.random.fold_in(step_rng, hash(name) % 997),
                      "modality": step_rng},
                mutable=["batch_stats"], method="forward_pretrain",
            )
            new_bs = mut.get("batch_stats", new_bs)
            tm = out["time_mask"]
            if tm is None:
                tm = jnp.ones_like(out["valid_mask"])
            l, _ = hubert_loss(
                [out["logits"][0]], [km_j], tm, out["valid_mask"],
            )
            total = total + l
            metrics[name] = l
        return total, (metrics, new_bs)

    @jax.jit
    def train_step(p, o, bs, step_rng):
        (loss, (m, bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, bs, step_rng)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, bs, loss, m

    key = jax.random.PRNGKey(args.seed + 7)
    t0 = time.time()
    first = None
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, batch_stats, loss, m = train_step(
            params, opt_state, batch_stats, sub)
        if first is None:
            first = {k: float(v) for k, v in m.items()}
        if (step + 1) % 25 == 0:
            print(json.dumps({"step": step + 1, **{
                k: round(float(v), 4) for k, v in m.items()}}), flush=True)
    last = {k: float(v) for k, v in m.items()}
    for k in last:
        assert last[k] < first[k], (k, first, last)
    print(json.dumps({"done": True, "steps": args.steps,
                      "first": {k: round(v, 3) for k, v in first.items()},
                      "last": {k: round(v, 3) for k, v in last.items()},
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
