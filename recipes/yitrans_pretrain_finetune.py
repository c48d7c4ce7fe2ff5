#!/usr/bin/env python
"""YiTrans end-to-end: stage-1 joint pretrain -> ASR / MT / ST fine-tunes.

Runnable tiny-config example of the complete YiTrans task chain (reference
YiTrans/yitrans_iwslt22/: models/pretrain_ed.py:200 pretraining,
tasks/iwslt_joint_pretraining.py:360-540 multi-corpus data composition,
tasks/iwslt_translation_from_pretrain.py:135-205 fine-tune loading,
finetune_asr.py:115 / finetune_mt.py:89 / finetune_st.py:85 heads):

  stage 1: MultiCorpusLoader over {speech w/ km units, multilingual
           denoised mono text (en_XX + de_DE with [lang] tags)}
  stage 2: warm-started fine-tunes — ASR (CE+CTC), MT (LangPairDataset,
           prev BOS = [tgt] tag), ST (CE)
  decode:  jitted beam search through the shared ASRDecoder (encode_text
           for MT, encode_speech for ASR/ST)

Synthetic fixtures stand in for binarized corpora; swap the line lists for
real tokenized text and the synthetic wavs for manifest datasets
(speecht5_tpu.data.manifests) for real runs.

Usage: python recipes/yitrans_pretrain_finetune.py [--pretrain-steps N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain-steps", type=int, default=12)
    ap.add_argument("--finetune-steps", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from speecht5_tpu.data.dictionary import Dictionary
    from speecht5_tpu.data.multicorpus import MultiCorpusLoader, TokenCorpusSpec
    from speecht5_tpu.data.text_noising import NoisingConfig
    from speecht5_tpu.data.yitrans import (
        LangPairDataset, MultilingualDenoisingDataset, add_multilingual_symbols,
    )
    from speecht5_tpu.models.yitrans import YiTransModel, yitrans_tiny
    from speecht5_tpu.train.joint import JointLossConfig, make_yitrans_pretrain_loss
    from speecht5_tpu.train.criterions import label_smoothed_ce
    from speecht5_tpu.decode.asr import ASRDecoder

    rng = np.random.default_rng(args.seed)

    # ---- dictionary: words + [lang] tags + <mask> ---------------------------
    d = Dictionary()
    for i in range(40):
        d.add_symbol(f"w{i}")
    lang_ids = add_multilingual_symbols(d, ["en_XX", "de_DE"])
    cfg = yitrans_tiny(vocab_size=len(d))
    model = YiTransModel(cfg)

    # ---- synthetic corpora --------------------------------------------------
    T_WAV, B_SP, B_TXT, L_TXT = 4000, 2, 4, 12
    frames = cfg.conv_features.out_length(T_WAV)

    def text_lines(n, seed):
        r = np.random.default_rng(seed)
        return [" ".join(f"w{i}" for i in r.integers(0, 40, L_TXT))
                for _ in range(n)]

    speech_ds = [{
        "wav": rng.standard_normal(T_WAV).astype(np.float32) * 0.1,
        "units": rng.integers(0, cfg.unit_vocab_size, frames, np.int64),
    } for _ in range(16)]

    def collate_speech(items):
        return {
            "wav": jnp.stack([jnp.asarray(x["wav"]) for x in items]),
            "wav_lengths": jnp.full((len(items),), T_WAV, jnp.int32),
            "units": jnp.stack(
                [jnp.asarray(x["units"], jnp.int32) for x in items]),
        }

    noising = NoisingConfig(mask_ratio=0.3)
    mono_en = MultilingualDenoisingDataset(
        text_lines(20, 10), d, "en_XX", noising, seed=args.seed)
    mono_de = MultilingualDenoisingDataset(
        text_lines(20, 11), d, "de_DE", noising, seed=args.seed)

    def collate_text(ds):
        def fn(items):
            b = ds.collate(items, bucketed=False)
            return {k: jnp.asarray(v) for k, v in b.items()}
        return fn

    total = len(speech_ds) + len(mono_en) + len(mono_de)
    # both mono languages share the "text_mono" stream (the reference
    # concatenates them, iwslt_joint_pretraining.py:449-489 + ConcatDataset)
    text_budget = (L_TXT + 1) * B_TXT
    loader = MultiCorpusLoader([
        TokenCorpusSpec("speech", speech_ds, collate_speech,
                        np.full(len(speech_ds), T_WAV),
                        sample_ratio=len(speech_ds) / total),
        TokenCorpusSpec("text_mono.en_XX", mono_en, collate_text(mono_en),
                        mono_en.sizes, sample_ratio=len(mono_en) / total,
                        max_tokens_ratio=text_budget / (T_WAV * B_SP),
                        stream="text_mono"),
        TokenCorpusSpec("text_mono.de_DE", mono_de, collate_text(mono_de),
                        mono_de.sizes, sample_ratio=len(mono_de) / total,
                        max_tokens_ratio=text_budget / (T_WAV * B_SP),
                        stream="text_mono"),
    ], max_tokens=T_WAV * B_SP, seed=args.seed)

    # ---- init + stage-1 pretrain -------------------------------------------
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    tokens0 = jnp.full((2, 6), 5, jnp.int32)
    variables = jax.jit(lambda: model.init(
        rngs, jnp.zeros((B_SP, T_WAV)), jnp.full((B_SP,), T_WAV),
        tokens0, tokens0, method="init_all"))()

    loss_fn = make_yitrans_pretrain_loss(model, JointLossConfig())
    tx = optax.adamw(args.lr)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def pretrain_step(params, opt_state, batch, step_rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, step_rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    key = jax.random.PRNGKey(args.seed + 7)
    t0 = time.time()
    step, epoch = 0, 0
    while step < args.pretrain_steps:
        for _, joint in loader.iter_epoch(epoch):
            key, sub = jax.random.split(key)
            params, opt_state, loss, metrics = pretrain_step(
                params, opt_state, joint, sub)
            step += 1
            print(json.dumps({
                "stage": "pretrain", "step": step,
                "loss": round(float(loss), 4),
                "denoise_loss": round(float(metrics.get("denoise_loss", -1)), 4),
            }), flush=True)
            if step >= args.pretrain_steps:
                break
        epoch += 1
    print(f"stage 1 done in {time.time()-t0:.1f}s", file=sys.stderr)

    # ---- stage-2 fine-tunes (warm-started from the pretrained params) ------
    pair = LangPairDataset(
        text_lines(12, 20), text_lines(12, 21), d, d, "en_XX", "de_DE",
        append_source_id=False, mask_text_ratio=0.2, seed=args.seed,
    )

    asr_prev = jnp.asarray(rng.integers(4, 40, (B_SP, 8)), jnp.int32)

    def ft_loss(task):
        def fn(params, batch, step_rng):
            v = {"params": params}
            rngs_d = {"dropout": step_rng, "mask": jax.random.fold_in(step_rng, 1)}
            if task == "mt":
                logits = model.apply(
                    v, batch["src_tokens"], batch["prev_tokens"],
                    deterministic=False, rngs=rngs_d, method="forward_mt")
                tgt, valid = batch["targets"], batch["targets"] != cfg.pad_id
                ce, _ = label_smoothed_ce(
                    logits.astype(jnp.float32), tgt, valid, 0.1)
                return ce, {"ce": ce}
            if task == "asr":
                logits, ctc_logits, enc_valid = model.apply(
                    v, batch["wav"], batch["wav_lengths"],
                    batch["prev_tokens"], mask=True, deterministic=False,
                    rngs=rngs_d, method="forward_asr")
                tgt, valid = batch["targets"], batch["targets"] != cfg.pad_id
                ce, _ = label_smoothed_ce(
                    logits.astype(jnp.float32), tgt, valid, 0.1)
                from speecht5_tpu.ops.ctc import ctc_loss as ctc

                lp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), -1)
                in_len = enc_valid.astype(jnp.int32).sum(-1)
                t_len = valid.astype(jnp.int32).sum(-1)
                nll = ctc(lp, in_len, tgt, t_len, cfg.blank_id)
                loss = 0.7 * ce + 0.3 * nll.mean() / 8
                return loss, {"ce": ce}
            # st
            logits = model.apply(
                v, batch["wav"], batch["wav_lengths"], batch["prev_tokens"],
                mask=False, deterministic=False, rngs=rngs_d,
                method="forward_st")
            tgt, valid = batch["targets"], batch["targets"] != cfg.pad_id
            ce, _ = label_smoothed_ce(logits.astype(jnp.float32), tgt, valid, 0.1)
            return ce, {"ce": ce}
        return fn

    for task in ("asr", "mt", "st"):
        ft_params = params  # warm start
        ft_opt = tx.init(ft_params)
        lf = ft_loss(task)

        @jax.jit
        def ft_step(p, o, batch, r, lf=lf):
            (loss, m), grads = jax.value_and_grad(lf, has_aux=True)(p, batch, r)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        for i in range(args.finetune_steps):
            if task == "mt":
                idxs = rng.integers(0, len(pair), B_TXT)
                batch = {k: jnp.asarray(v) for k, v in
                         pair.collate([pair[int(j)] for j in idxs],
                                      bucketed=False).items()}
            else:
                wav = jnp.stack([jnp.asarray(speech_ds[j]["wav"])
                                 for j in rng.integers(0, 16, B_SP)])
                tgt = jnp.asarray(rng.integers(4, 40, (B_SP, 8)), jnp.int32)
                batch = {
                    "wav": wav,
                    "wav_lengths": jnp.full((B_SP,), T_WAV, jnp.int32),
                    "prev_tokens": jnp.concatenate(
                        [jnp.full((B_SP, 1), lang_ids["de_DE"], jnp.int32),
                         tgt[:, :-1]], axis=1),
                    "targets": tgt,
                }
            key, sub = jax.random.split(key)
            ft_params, ft_opt, loss = ft_step(ft_params, ft_opt, batch, sub)
            print(json.dumps({"stage": f"finetune_{task}", "step": i + 1,
                              "loss": round(float(loss), 4)}), flush=True)

        # jitted beam decode through the shared runtime
        dec = ASRDecoder(
            model, {"params": ft_params}, beam_size=3, max_len=10,
            encode_method="encode_text" if task == "mt" else "encode_speech",
        )
        if task == "mt":
            b = pair.collate([pair[0], pair[1]], bucketed=False)
            res = dec(jnp.asarray(b["src_tokens"]))
        else:
            res = dec(jnp.stack([jnp.asarray(speech_ds[0]["wav"])]),
                      jnp.asarray([T_WAV]))
        toks = np.asarray(res.tokens)[:, 0]
        print(json.dumps({"stage": f"decode_{task}",
                          "hyp0": toks[0].tolist()[:8]}), flush=True)

    print(f"all stages done in {time.time()-t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
