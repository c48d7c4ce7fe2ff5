"""Training entry point: preset -> datasets -> sharded Trainer -> checkpoints.

Replaces the fairseq-train CLI recipes (reference SpeechT5/README.md:80-211):
one typed preset instead of ~120 flags, deterministic/resumable data order,
jitted train step over a Mesh('data','model').

Usage (ASR fine-tune):
    python -m speecht5_tpu.cli.train --task s2t --arch speecht5_base_asr \
        --manifest train.tsv --labels train.ltr --dict dict.ltr.txt \
        --save-dir ckpt/ --max-updates 80000 --batch-size 16
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import numpy as np


def build_dataset(args, dictionary, cfg):
    from ..data import manifests as M

    if args.task == "s2t":
        return M.SpeechToTextDataset(
            manifest=args.manifest, labels=args.labels, dictionary=dictionary,
            normalize=args.normalize,
            max_sample_size=args.max_sample_size,
        )
    dev_mel = bool(getattr(args, "device_mel", False))
    if args.task == "t2s":
        return M.TextToSpeechDataset(
            manifest=args.manifest, labels=args.labels, dictionary=dictionary,
            spkemb_dir=args.spkemb_dir,
            reduction_factor=cfg.reduction_factor, n_mels=cfg.n_mels,
            device_mel=dev_mel,
        )
    if args.task == "s2s":
        return M.SpeechToSpeechDataset(
            manifest=args.manifest, normalize=args.normalize,
            reduction_factor=cfg.reduction_factor, n_mels=cfg.n_mels,
            device_mel=dev_mel,
        )
    if args.task == "s2c":
        cm = getattr(args, "class_map", None)
        return M.SpeechToClassDataset(
            manifest=args.manifest, normalize=args.normalize,
            max_sample_size=args.max_sample_size,
            class_map=(M.SpeechToClassDataset.load_class_map(cm)
                       if cm else None),
        )
    if args.task == "pretrain_speech":
        return M.SpeechPretrainDataset(
            manifest=args.manifest, km_labels=args.labels,
            n_mels=cfg.n_mels, reduction_factor=cfg.reduction_factor,
            normalize=args.normalize, device_mel=dev_mel,
        )
    if args.task == "pretrain":
        # joint speech+text pretraining (reference tasks/speecht5.py:396-517)
        speech = M.SpeechPretrainDataset(
            manifest=args.manifest, km_labels=args.labels,
            n_mels=cfg.n_mels, reduction_factor=cfg.reduction_factor,
            normalize=args.normalize, device_mel=dev_mel,
        )
        text = M.TextPretrainDataset(
            text_file=args.text_file, dictionary=dictionary,
            tokens_per_sample=args.tokens_per_sample,
            bos_id=cfg.bos_id, eos_id=cfg.eos_id, pad_id=cfg.pad_id,
            mask_id=dictionary.index("<mask>"), seed=args.seed,
        )
        return {"pretrain_speech": speech, "pretrain_text": text}
    raise ValueError(f"unknown task {args.task}")


def collate_batch(args, ds, items, cfg, model):
    if args.task == "s2t":
        b = ds.collate(items, cfg.eos_id, cfg.pad_id)
    elif args.task == "t2s":
        b = ds.collate(items, cfg.eos_id, cfg.pad_id)
    elif args.task in ("s2s", "s2c"):
        b = ds.collate(items)
    else:  # pretrain_speech
        b = ds.collate(items, cfg.conv_features.out_length)
    b.pop("ids", None)
    return b


def make_batches(sizes, args, seed):
    from ..data.manifests import batch_by_size

    if args.max_tokens:
        return batch_by_size(
            sizes, args.max_tokens, args.batch_size or None, shuffle_seed=seed
        )
    order = np.random.default_rng(seed).permutation(len(sizes))
    B = args.batch_size or 8
    if len(order) < B:
        raise SystemExit(
            f"dataset has {len(sizes)} items < --batch-size {B}: no full "
            f"batch can be formed (the trailing partial batch is dropped to "
            f"keep shapes static)"
        )
    return [order[i : i + B] for i in range(0, len(order) - B + 1, B)]


def _pad_values(cfg):
    """Pad ids for token-valued batch keys when cross-host shape unification
    pads a host's bucket up (everything else pads with 0)."""
    return {k: cfg.pad_id for k in ("targets", "prev_tokens", "tokens")}


def run_validation(trainer, ds, args, cfg, dictionary):
    """Average eval-step metrics over the validation set; for s2t also the
    greedy-CTC WER/UER (the reference's in-training WER,
    speech_to_text_loss.py:232-297).  Under multi-host, each process scores
    its row slice and the additive error/token counts are summed across
    hosts (the reference's cross-rank reduce_metrics, SURVEY.md 5.5)."""
    import numpy as np
    from ..parallel import distributed as D
    from ..utils.metrics import MetricsLogger, edit_distance
    from ..data.dictionary import letters_to_text

    multi = D.process_count() > 1
    logger = MetricsLogger()
    uer_err = uer_tot = 0
    wer_err = wer_tot = 0
    B = args.batch_size
    n = len(ds) - len(ds) % B  # full batches only (sharded eval step)
    for s in range(0, n, B):
        rows = D.process_rows(B) if multi else slice(0, B)
        items = [ds[i] for i in range(s + rows.start, s + rows.stop)]
        batch = collate_batch(args, ds, items, cfg, trainer.model)
        if multi:
            batch = D.unify_batch_shapes(batch, _pad_values(cfg))
        out = trainer.eval_step(batch)
        ctc_ids = out.pop("_ctc_ids", None)
        enc_lengths = out.pop("_enc_lengths", None)
        logger.update({k: float(v) for k, v in out.items()}, n=B)
        if ctc_ids is not None and args.ctc_weight > 0:
            # collapse repeats, drop blanks (greedy CTC on argmax ids);
            # local_rows = exactly this host's items, in order
            ids = D.local_rows(ctc_ids) if multi else np.asarray(ctc_ids)
            lens = (D.local_rows(enc_lengths) if multi
                    else np.asarray(enc_lengths))
            for b, it in enumerate(items):
                seq = ids[b, : lens[b]]
                if len(seq) == 0:
                    seq = np.zeros((0,), ids.dtype)
                else:
                    seq = seq[np.concatenate([[True], seq[1:] != seq[:-1]])]
                seq = seq[(seq != cfg.blank_id) & (seq != cfg.pad_id)]
                ref = [t for t in it["tokens"].tolist()
                       if t not in (cfg.pad_id, cfg.eos_id)]
                uer_err += edit_distance(seq.tolist(), ref)
                uer_tot += max(len(ref), 1)
                if dictionary is not None:
                    hyp_w = letters_to_text(dictionary.string(seq)).split()
                    ref_w = letters_to_text(dictionary.string(ref)).split()
                    wer_err += edit_distance(ref_w, hyp_w)
                    wer_tot += len(ref_w)
    counts = D.allsum_scalars({
        "uer_err": uer_err, "uer_tot": uer_tot,
        "wer_err": wer_err, "wer_tot": wer_tot,
    })
    result = logger.averages()
    if counts["uer_tot"]:
        result["uer"] = counts["uer_err"] / counts["uer_tot"]
        if counts["wer_tot"]:
            result["wer"] = counts["wer_err"] / counts["wer_tot"]
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True,
                   choices=["s2t", "t2s", "s2s", "s2c", "pretrain_speech",
                            "pretrain"])
    p.add_argument("--text-file", default=None,
                   help="raw text corpus for --task pretrain")
    p.add_argument("--tokens-per-sample", type=int, default=512)
    p.add_argument("--text-ratio", type=float, default=1.0,
                   help="text batches per speech batch in joint pretraining")
    p.add_argument("--arch", default="speecht5_base",
                   help="config preset name in speecht5_tpu.config")
    p.add_argument("--manifest", required=True)
    p.add_argument("--labels", default=None)
    p.add_argument("--dict", dest="dict_path", default=None)
    p.add_argument("--spkemb-dir", default=None)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--max-updates", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-tokens", type=int, default=0)
    p.add_argument("--max-sample-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--schedule", default="inverse_sqrt",
                   choices=("inverse_sqrt", "tri_stage", "polynomial"),
                   help="LR schedule (fairseq --lr-scheduler; the reference "
                        "ASR fine-tune uses tri_stage, pretrain inverse_sqrt)")
    p.add_argument("--hold-steps", type=int, default=0,
                   help="tri_stage hold phase length")
    p.add_argument("--clip-norm", type=float, default=5.0)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--ce-weight", type=float, default=1.0)
    p.add_argument("--ctc-weight", type=float, default=0.0)
    p.add_argument("--zero-infinity", action="store_true",
                   help="zero CTC loss for infeasible alignments "
                        "(reference --zero-infinity, README.md:178)")
    p.add_argument("--label-smoothing", type=float, default=0.1)
    p.add_argument("--guided-attn", action="store_true")
    p.add_argument("--freeze-encoder-updates", type=int, default=0,
                   help="freeze speech prenet + encoder (not the CTC head) "
                        "for the first N updates (reference "
                        "--freeze-encoder-updates)")
    p.add_argument("--freeze-decoder-updates", type=int, default=0,
                   help="freeze decoder + decoder pre/postnets for the "
                        "first N updates")
    p.add_argument("--no-freeze-encoder-layers", default="",
                   help="comma-separated encoder layer indices exempt from "
                        "the encoder freeze (reference "
                        "--no-freeze-encoder-layer)")
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--device-mel", dest="device_mel", action="store_true",
                   default=True,
                   help="t2s/s2s/pretrain_speech: compute log-mel targets "
                        "(and the SE source fbank) IN-GRAPH from the raw "
                        "waveform (fused Pallas kernel on TPU) instead of "
                        "per-utterance host numpy — removes the host fbank "
                        "from the input pipeline's critical path (4.9x "
                        "pipeline A/B, PERF.md section 10).  DEFAULT ON; "
                        "--host-mel restores the reference-faithful host "
                        "path")
    p.add_argument("--host-mel", dest="device_mel", action="store_false",
                   help="compute fbanks per utterance on the host (the "
                        "reference's librosa-in-dataset pipeline, "
                        "text_to_speech_dataset.py:97-138)")
    p.add_argument("--mask-prob", type=float, default=None,
                   help="override HuBERT masking prob (e.g. 0 to disable)")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--save-interval", type=int, default=1000)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--valid-manifest", default=None)
    p.add_argument("--valid-labels", default=None)
    p.add_argument("--valid-interval", type=int, default=1000)
    p.add_argument("--best-checkpoint-metric", default=None,
                   help="validation metric (e.g. wer, loss, accuracy) that "
                        "selects the best/ checkpoint (fairseq "
                        "--best-checkpoint-metric, SpeechT5/README.md:205)")
    p.add_argument("--maximize-best-checkpoint-metric", action="store_true")
    p.add_argument("--keep-last", type=int, default=10,
                   help="interval checkpoints retained (fairseq "
                        "--keep-last-epochs, SpeechT5/README.md:119,208)")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of steps 10-14 here")
    p.add_argument("--n-model-shards", type=int, default=1)
    p.add_argument("--fsdp", action="store_true")
    # multi-host launch (one process per host; reference multi-node DDP,
    # SpeechT5/README.md:92-94).  On TPU pods all three are auto-detected —
    # pass only --distributed-num-processes with no coordinator to opt in.
    p.add_argument("--distributed-coordinator", default=None,
                   help="host:port of process 0")
    p.add_argument("--distributed-num-processes", type=int, default=None)
    p.add_argument("--distributed-process-id", type=int, default=None)
    p.add_argument("--distributed-platform", default=None,
                   help="force a backend for the multi-process run "
                        "(cpu = gloo-collective integration rig)")
    p.add_argument("--rng-impl", default="rbg", choices=("rbg", "threefry2x32"),
                   help="PRNG for dropout/masking keys: 'rbg' lowers to the "
                        "TPU hardware RNG instruction (profiled ~10%% faster "
                        "base-ASR train step than threefry's vector program); "
                        "'threefry2x32' keeps jax's default counter-based "
                        "generator (bit-stable across backends)")
    p.add_argument("--finetune-from", default=None,
                   help="orbax checkpoint dir for warm start (non-strict)")
    p.add_argument("--vocab-size", type=int, default=None,
                   help="override vocab (tasks without a dictionary)")
    p.add_argument("--override", action="append", default=[],
                   help="config field override, dotted path = literal, "
                        "repeatable: --override sid.encoder_cls=True "
                        "--override se_predict=masking")
    args = p.parse_args(argv)

    from ..parallel import distributed as D

    if args.distributed_num_processes:
        # multi-host: join the global runtime BEFORE the first backend use
        # (reference --distributed-world-size N over NCCL,
        # SpeechT5/README.md:92-94; here jax.distributed + XLA collectives)
        D.initialize(
            coordinator_address=args.distributed_coordinator,
            num_processes=args.distributed_num_processes,
            process_id=args.distributed_process_id,
            platform=args.distributed_platform,
        )

    import jax
    from .. import config as C
    from ..models.speecht5 import init_model
    from ..parallel.sharding import make_mesh
    from ..train.trainer import Trainer, TrainConfig
    from ..utils.checkpoint import CheckpointManager, partial_load
    from ..utils.metrics import MetricsLogger

    t_start = time.time()
    from ..data.dictionary import load_cli_dictionary

    dictionary, cfg_kw = load_cli_dictionary(args.dict_path, args.vocab_size)
    cfg_kw["dtype"] = args.dtype

    preset = getattr(C, args.arch)
    cfg = preset(**cfg_kw)
    cfg = C.apply_overrides(cfg, args.override)
    if args.mask_prob is not None:
        cfg = C.replace(
            cfg, masking=C.replace(
                cfg.masking, mask_prob=args.mask_prob,
                mask_channel_prob=min(cfg.masking.mask_channel_prob,
                                      args.mask_prob),
            )
        )

    ds = build_dataset(args, dictionary, cfg)
    if args.task == "s2c":
        if cfg.sid.num_classes != ds.num_classes:
            cfg = C.replace(
                cfg, sid=C.replace(cfg.sid, num_classes=ds.num_classes)
            )
        # persist the label->id mapping so eval manifests with a different
        # speaker subset reuse the TRAINING mapping
        os.makedirs(args.save_dir, exist_ok=True)
        ds.save_class_map(os.path.join(args.save_dir, "class_map.txt"))
    valid_ds = None
    if args.valid_manifest:
        if args.task == "pretrain":
            raise SystemExit(
                "--valid-manifest is not supported with --task pretrain "
                "(run a separate eval of the fine-tune task instead)"
            )
        import copy as _copy

        vargs = _copy.copy(args)
        vargs.manifest = args.valid_manifest
        vargs.labels = args.valid_labels or args.labels
        valid_ds = build_dataset(vargs, dictionary, cfg)
        if args.task == "s2c":
            # validation must score against the TRAINING label->id mapping
            valid_ds.class_map = dict(ds.class_map)
            valid_ds.check_labels()

    model, variables = init_model(cfg, jax.random.PRNGKey(args.seed))

    if args.finetune_from:
        mgr0 = CheckpointManager(args.finetune_from)
        restored, _ = mgr0.restore_model(variables)
        if restored is not None:
            variables = dict(variables)
            variables["params"] = partial_load(
                variables["params"], restored["params"]
            )
            print(f"warm start from {args.finetune_from}", flush=True)

    mesh = make_mesh(n_model=args.n_model_shards)
    tcfg = TrainConfig(
        lr=args.lr, warmup_steps=args.warmup, clip_norm=args.clip_norm,
        schedule=args.schedule, hold_steps=args.hold_steps,
        accum_steps=args.accum, ce_weight=args.ce_weight,
        ctc_weight=args.ctc_weight, zero_infinity=args.zero_infinity,
        label_smoothing=args.label_smoothing,
        use_guided_attn=args.guided_attn, total_steps=args.max_updates,
        freeze_encoder_updates=args.freeze_encoder_updates,
        freeze_decoder_updates=args.freeze_decoder_updates,
        no_freeze_encoder_layers=tuple(
            int(i) for i in args.no_freeze_encoder_layers.split(",") if i
        ),
    )
    multitask = isinstance(ds, dict)
    trainer = Trainer(
        model, variables, list(ds.keys()) if multitask else args.task,
        tcfg, mesh=mesh, fsdp=args.fsdp,
    )
    mgr = CheckpointManager(
        args.save_dir, max_to_keep=args.keep_last,
        best_metric=args.best_checkpoint_metric,
        maximize_best=args.maximize_best_checkpoint_metric,
    )
    logger = MetricsLogger(args.save_dir if D.is_primary() else None)

    # resume
    state, data_state, step0 = mgr.restore(trainer.state)
    step = 0
    epoch0, batch0 = 0, 0
    if state is not None:
        trainer.state = jax.device_put(state, trainer.state_shardings)
        step = step0
        if data_state:
            epoch0 = data_state.get("epoch", 0)
            batch0 = data_state.get("batch", 0)
        if D.is_primary():
            print(f"resumed at step {step}", flush=True)

    def epoch_batches(epoch: int):
        """[(task_name, item_indices)] — modality-pure batches, deterministic
        ratio-balanced interleave for joint pretraining (the reference's
        MultitaskDataset semantics, data/multitask_dataset.py:147-177)."""
        if not multitask:
            return [(args.task, idxs)
                    for idxs in make_batches(ds.sizes, args, args.seed + epoch)]
        tagged = []
        for name, d in ds.items():
            bs = make_batches(d.sizes, args, args.seed + epoch)
            reps = args.text_ratio if name == "pretrain_text" else 1.0
            n = max(int(round(len(bs) * reps)), 1)
            tagged += [(name, bs[i % len(bs)]) for i in range(n)]
        np.random.default_rng(args.seed + 31 * epoch).shuffle(tagged)
        return tagged

    def collate_for(task_name, d, items, epoch):
        if task_name == "pretrain_speech":
            b = d.collate(items, cfg.conv_features.out_length)
        elif task_name == "pretrain_text":
            b = d.collate(items, epoch=epoch)
        else:
            b = collate_batch(args, d, items, cfg, model)
            return b
        b.pop("ids", None)
        return b

    from ..utils.profiling import PhaseTimer, trace as profiler_trace

    timer = PhaseTimer("train", verbose=False)
    profiling = False
    profiler_ctx = None
    # typed key: raw PRNGKey arrays lose the impl at the next split, a typed
    # jax.random.key carries it through split/fold_in
    rng = jax.random.key(args.seed + 7, impl=args.rng_impl)
    epoch = epoch0
    last_loss = None
    done = step >= args.max_updates
    from ..data.prefetch import prefetch

    # preemption-safe shutdown: SIGTERM/SIGINT set a flag; the loop saves a
    # full resumable checkpoint at the next step boundary and exits cleanly.
    # (The reference has nothing — a killed fairseq run loses everything
    # since the last --save-interval-updates; SURVEY.md §5.3.)  Under
    # multi-host the local flags are OR-reduced across hosts each step so
    # every process stops at the SAME step — a host stopping alone would
    # leave the others hanging in a collective.
    import signal

    stop_requested = {"flag": False}

    def _on_term(signum, frame):
        stop_requested["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_term)
        except ValueError:  # non-main thread (tests)
            pass

    multi = D.process_count() > 1

    def batch_stream(epoch: int, start: int):
        """Collated batches for one epoch; runs on the prefetch thread so
        audio decode + log-mel + collation overlap the device step.  Under
        multi-host, every process walks the SAME deterministic batch order
        but loads only its contiguous row slice of each global batch."""
        for bi, (task_name, idxs) in enumerate(epoch_batches(epoch)):
            if bi < start:
                continue
            d = ds[task_name] if multitask else ds
            rows = idxs[D.process_rows(len(idxs))] if multi else idxs
            items = [d[int(i)] for i in rows]
            yield bi, task_name, collate_for(task_name, d, items, epoch)

    log_win = (time.time(), step)   # (wall, step) at the last log line
    while not done:
        start = batch0 if epoch == epoch0 else 0
        for bi, task_name, batch in prefetch(batch_stream(epoch, start)):
            if args.profile_dir and step == 10 and not profiling:
                profiler_ctx = profiler_trace(args.profile_dir)
                profiler_ctx.__enter__()
                profiling = True
            stop = stop_requested["flag"]
            if multi:
                # cross-host shape unification is a collective: issue it on
                # the MAIN thread so every host's collective order is the
                # program order (the prefetch thread must stay IO-only).
                # The preemption flag rides the same cadence (OR-reduce).
                batch = D.unify_batch_shapes(batch, _pad_values(cfg))
                stop = D.allsum_scalars({"stop": float(stop)})["stop"] > 0
            if stop:
                mgr.save(
                    step, trainer.state,
                    data_state={"epoch": epoch, "batch": bi},
                    model={"params": trainer.state.params,
                           **trainer.state.extra},
                )
                if D.is_primary():
                    print(json.dumps({"preempted": True, "step": step}),
                          flush=True)
                done = True
                break
            timer.phase("data")
            rng, sub = jax.random.split(rng)
            timer.phase("step")
            metrics = trainer.train_step(
                batch, sub, task=task_name if multitask else None
            )
            timer.phase("log", fence=metrics["loss"])
            last_loss = float(metrics["loss"])
            if profiling and step >= 14:
                profiler_ctx.__exit__(None, None, None)
                profiling = False
            step += 1
            logger.update(
                {k: float(v) for k, v in metrics.items()}, step=step,
                prefix=task_name if multitask else "",
            )
            if step % args.log_interval == 0:
                avg = logger.averages()
                # windowed rate: cumulative step/elapsed is misleading on
                # resumed runs (global step vs this process's clock) and
                # masks rate changes
                now = time.time()
                avg["ups"] = (step - log_win[1]) / max(now - log_win[0], 1e-6)
                log_win = (now, step)
                if D.is_primary():
                    print(json.dumps({"step": step, **{
                        k: round(v, 4) for k, v in avg.items()}}), flush=True)
                logger.reset()
            if valid_ds is not None and step % args.valid_interval == 0:
                vm = run_validation(trainer, valid_ds, args, cfg, dictionary)
                improved = mgr.save_best(
                    step, vm, state=trainer.state,
                    data_state={"epoch": epoch, "batch": bi + 1},
                    model={"params": trainer.state.params,
                           **trainer.state.extra},
                )
                if D.is_primary():
                    print(json.dumps({"step": step, **{
                        f"valid_{k}": round(v, 4) for k, v in vm.items()},
                        **({"new_best": mgr.best_metric} if improved else {})}),
                        flush=True)
            if step % args.save_interval == 0 or step >= args.max_updates:
                # the weights-only 'model' item duplicates params on disk,
                # but checkpoint averaging (--avg-last), eval of interrupted
                # runs, and --finetune-from all restore it per step — keep it
                # on every save
                mgr.save(
                    step, trainer.state,
                    data_state={"epoch": epoch, "batch": bi + 1},
                    model={"params": trainer.state.params,
                           **trainer.state.extra},
                )
            if step >= args.max_updates:
                done = True
                break
        epoch += 1
        batch0 = 0
    if profiling:
        profiler_ctx.__exit__(None, None, None)
    mgr.wait()
    for sig, h in prev_handlers.items():
        signal.signal(sig, h)
    if D.is_primary():
        print(f"phases: {timer.summary()}", flush=True)
    print(json.dumps({"done": True, "steps": step,
                      "process": D.process_index(),
                      "final_loss": last_loss,
                      "wall": round(time.time() - t_start, 1)}), flush=True)


if __name__ == "__main__":
    main()
