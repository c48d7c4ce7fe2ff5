"""Evaluation entry point: checkpoint -> decoder -> WER / accuracy / MCD.

Replaces fairseq-generate + the reference eval scripts
(scripts/generate_speech.py, scripts/generate_class.py, README decode recipes
at SpeechT5/README.md:213-246) with one batched, jitted path per task:
- s2t: joint CTC/attention beam search -> corpus WER (letter labels)
- s2c: batched classification -> accuracy
- t2s/s2s: AR mel decode (+ optional vocoder) -> MCD vs ground-truth mel,
  mel .npy dumps

Usage:
    python -m speecht5_tpu.cli.evaluate --task s2t --arch speecht5_base_asr \
        --manifest test.tsv --labels test.ltr --dict dict.ltr.txt \
        --ckpt ckpt/ --beam 5 --ctc-weight 0.3
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from .train import build_dataset


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True,
                   choices=["s2t", "t2s", "s2s", "s2c"])
    p.add_argument("--arch", default="speecht5_base")
    p.add_argument("--manifest", required=True)
    p.add_argument("--labels", default=None)
    p.add_argument("--dict", dest="dict_path", default=None)
    p.add_argument("--spkemb-dir", default=None)
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max-len", type=int, default=256)
    p.add_argument("--ctc-weight", type=float, default=0.0)
    p.add_argument("--lm-weight", type=float, default=0.0)
    p.add_argument("--lm-ckpt", default=None,
                   help="orbax dir with a TransformerLM 'model' item for "
                        "shallow fusion (reference --lm-path, "
                        "SpeechT5/README.md:241-244)")
    p.add_argument("--lm-arch", default="t5", choices=("t5", "tiny"),
                   help="fusion LM architecture: 't5' = the reference's "
                        "20-layer transformer_lm_t5 (models/t5_transformer_lm.py), "
                        "'tiny' for tests")
    p.add_argument("--max-sample-size", type=int, default=None)
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--results-path", default=None)
    p.add_argument("--max-frames", type=int, default=1600,
                   help="t2s/s2s: static AR output buffer in mel frames "
                        "(the per-utterance stop is still max_len_ratio)")
    p.add_argument("--griffin-lim", action="store_true",
                   help="t2s/s2s: also write Griffin-Lim waveforms next to "
                        "the mel dumps in --results-path (no vocoder "
                        "checkpoint needed, ops/mel.mel_to_audio)")
    p.add_argument("--vocab-size", type=int, default=None)
    p.add_argument("--ensemble-last", type=int, default=0,
                   help="decode with the last N checkpoints as a true "
                        "ensemble (per-step probability averaging, s2t only)")
    p.add_argument("--use-best", action="store_true",
                   help="load the best-metric checkpoint saved under "
                        "ckpt/best (train --best-checkpoint-metric; the "
                        "reference evaluates checkpoint_best.pt)")
    p.add_argument("--avg-last", type=int, default=0,
                   help="average the last N checkpoints (reference ST recipes "
                        "average 10, SpeechT5/README.md:437-441)")
    p.add_argument("--metric", default="wer", choices=["wer", "bleu"],
                   help="s2t scoring: WER for ASR, corpus BLEU for ST")
    p.add_argument("--decoder", default="beam",
                   choices=["beam", "ctc_greedy", "ctc_lexicon",
                            "ctc_rescore"],
                   help="s2t decode algorithm: 'beam' = joint CTC/attention "
                        "AR beam search; 'ctc_greedy' = viterbi collapse of "
                        "the encoder CTC posteriors (reference SpeechLM "
                        "infer_viterbi.yaml); 'ctc_lexicon' = native "
                        "lexicon-constrained CTC beam + word n-gram LM "
                        "(reference flashlight/kenlm, "
                        "SpeechLM/speechlm/infer.py:29-33,121); "
                        "'ctc_rescore' = CTC N-best prefix beam + one "
                        "teacher-forced decoder rescoring pass (the joint "
                        "beam's two scores, two batched forwards, no AR "
                        "loop)")
    p.add_argument("--rescore-nbest", type=int, default=8,
                   help="hypotheses per utterance kept for ctc_rescore")
    p.add_argument("--ctc-topk", type=int, default=0,
                   help="per-frame candidate pruning of the ctc_rescore "
                        "prefix beam (0 = all tokens; useful for BPE "
                        "vocabularies)")
    p.add_argument("--lexicon", default=None,
                   help="lexicon file for --decoder ctc_lexicon: "
                        "'word<TAB>tok1 tok2 ...' lines (prep "
                        "letter-lexicon builds one from labels)")
    p.add_argument("--lm-path", default=None,
                   help="word n-gram LM for ctc_lexicon: ARPA text or a "
                        "compiled binary (prep lm-binary / "
                        "decode.lexicon.build_binary_lm)")
    p.add_argument("--word-score", type=float, default=0.0,
                   help="per-word insertion bonus for ctc_lexicon "
                        "(reference decode config word_score)")
    p.add_argument("--ctc-beam-size", type=int, default=50,
                   help="beam width of the lexicon CTC decoder")
    p.add_argument("--override", action="append", default=[],
                   help="config field override, dotted path = literal, "
                        "repeatable (must match the training overrides)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each decode batch over all devices "
                        "(jax Mesh data axis; batch size must be a multiple "
                        "of the device count — the tail batch is padded)")
    args = p.parse_args(argv)
    args.max_tokens = 0  # build_dataset compat
    if args.lm_path and not args.lexicon:
        p.error("--lm-path requires --lexicon (the word n-gram LM scores "
                "lexicon words; without a lexicon it would be silently "
                "ignored — for neural-LM beam fusion use --lm-ckpt)")

    import jax
    import jax.numpy as jnp
    from .. import config as C
    from ..data.dictionary import letters_to_text, load_cli_dictionary
    from ..models.speecht5 import init_model
    from ..utils.checkpoint import CheckpointManager
    from ..utils.metrics import corpus_wer, corpus_bleu, mcd

    dictionary, cfg_kw = load_cli_dictionary(args.dict_path, args.vocab_size)
    cfg_kw["dtype"] = args.dtype

    preset = getattr(C, args.arch)
    cfg = preset(**cfg_kw)
    cfg = C.apply_overrides(cfg, args.override)
    if args.task == "s2t" and dictionary is None:
        raise SystemExit("--dict is required for --task s2t (hypotheses are "
                         "detokenized through the dictionary)")
    if args.task == "s2c":
        cm_path = os.path.join(args.ckpt, "class_map.txt")
        if os.path.exists(cm_path):
            args.class_map = cm_path
    ds = build_dataset(args, dictionary, cfg)
    if args.task == "s2c" and cfg.sid.num_classes != ds.num_classes:
        cfg = C.replace(cfg, sid=C.replace(cfg.sid, num_classes=ds.num_classes))

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(args.ckpt)
    ensemble = None
    if args.ensemble_last > 1 and args.task != "s2t":
        # ensemble decode is only wired into the s2t beam search; silently
        # decoding other tasks with just the last checkpoint would misreport
        raise SystemExit(
            "--ensemble-last is only supported for --task s2t "
            "(use --avg-last for weight-space averaging instead)"
        )
    if args.ensemble_last > 1:
        # true ensemble decode (reference EnsembleModel,
        # sequence_generator.py:819-961) over the last N checkpoints —
        # probability-space averaging per step, vs --avg-last's weight-space
        # averaging into one model
        steps = sorted(mgr.mngr.all_steps())[-args.ensemble_last:]
        trees = [mgr.restore_model(variables, step=s)[0] for s in steps]
        ensemble = [t for t in trees if t is not None]
        if not ensemble:
            raise SystemExit(f"no checkpoints found in {args.ckpt}")
        variables = ensemble[-1]
        step = steps[-1]
        print(f"ensemble of {len(ensemble)} checkpoints {steps}", flush=True)
    elif args.avg_last > 1:
        from ..utils.checkpoint import average_checkpoints

        steps = sorted(mgr.mngr.all_steps())[-args.avg_last:]
        trees = [mgr.restore_model(variables, step=s)[0] for s in steps]
        trees = [t for t in trees if t is not None]
        if not trees:
            raise SystemExit(f"no checkpoints found in {args.ckpt}")
        params = average_checkpoints([t["params"] for t in trees])
        variables = dict(trees[-1])
        variables["params"] = params
        step = steps[-1]
        print(f"averaged {len(trees)} checkpoints {steps}", flush=True)
    elif args.use_best:
        from ..utils.checkpoint import CheckpointManager as _CM

        best_mgr = _CM(args.ckpt, best_metric="_load")
        restored, step = best_mgr.restore_best_model(variables)
        if restored is None:
            raise SystemExit(f"no best checkpoint under {args.ckpt}/best "
                             f"(train with --best-checkpoint-metric)")
        variables = restored
        print(f"loaded BEST checkpoint step {step}", flush=True)
    else:
        restored, step = mgr.restore_model(variables)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.ckpt}")
        variables = restored
        print(f"loaded checkpoint step {step}", flush=True)

    lm = lm_vars = None
    if args.lm_ckpt:
        # shallow-fusion LM: per-step log-prob mix inside the jitted beam
        # loop (reference fairseq lm_model branch, sequence_generator.py)
        from dataclasses import replace as _dc_replace
        from ..models.lm import TransformerLM, TransformerLMConfig, lm_tiny

        lmcfg = lm_tiny() if args.lm_arch == "tiny" else TransformerLMConfig()
        lmcfg = _dc_replace(lmcfg, vocab_size=cfg.vocab_size,
                            pad_id=cfg.pad_id)
        lm = TransformerLM(lmcfg)
        lm_template = lm.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8), jnp.int32))
        lm_vars, lm_step = CheckpointManager(args.lm_ckpt).restore_model(
            lm_template)
        if lm_vars is None:
            raise SystemExit(f"no LM checkpoint found in {args.lm_ckpt}")
        print(f"fusion LM loaded (step {lm_step}), "
              f"weight {args.lm_weight}", flush=True)

    if args.results_path:
        os.makedirs(args.results_path, exist_ok=True)

    t0 = time.time()
    n = len(ds)
    order = list(range(n))
    result = {}

    if args.task == "s2t":
        # one shared batched-decode loop; the decoder choice only changes
        # how a batch becomes token rows:
        # - beam: jitted joint CTC/attention beam search (BeamResult with
        #   BOS/EOS framing)
        # - ctc_greedy / ctc_lexicon: encoder-only CTC decode — the
        #   reference SpeechLM eval stack (speechlm/infer.py + flashlight)
        mesh = None
        if args.data_parallel:
            from ..parallel.sharding import make_mesh

            mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
            if args.batch_size % len(jax.devices()) != 0:
                raise SystemExit(
                    f"--batch-size {args.batch_size} must be a multiple of "
                    f"the device count {len(jax.devices())}"
                )
            print(f"data-parallel decode over {len(jax.devices())} devices",
                  flush=True)

        def shard_vars(v):
            if mesh is None:
                return v
            from ..parallel.sharding import shard_decode_variables

            return shard_decode_variables(v, mesh)

        if args.decoder == "beam":
            from ..decode.asr import ASRDecoder

            dec_vars = ([shard_vars(v) for v in ensemble] if ensemble
                        else shard_vars(variables))
            dec = ASRDecoder(
                model, dec_vars,
                beam_size=args.beam, max_len=args.max_len,
                ctc_weight=args.ctc_weight,
                lm=lm, lm_variables=lm_vars, lm_weight=args.lm_weight,
            )

            def decode_rows(wav, wlen):
                res = dec(wav, wlen)
                toks = np.asarray(res.tokens)[:, 0]
                lens = np.asarray(res.lengths)[:, 0]
                return [toks[b, 1 : max(int(lens[b]) - 1, 1)]
                        for b in range(toks.shape[0])]
        elif args.decoder == "ctc_rescore":
            from ..decode.asr import RescoreDecoder

            if ensemble:
                raise SystemExit("--ensemble-last requires --decoder beam")
            lexicon = None
            if args.lexicon:
                # lexicon+LM-constrained N-best, attention-rescored — the
                # strongest operating point (reference infer_fsqlm.yaml
                # couples the flashlight beam with a fairseq LM similarly)
                from ..decode.lexicon import LexiconDecoder

                sep_id = dictionary.index("|")
                if sep_id == dictionary.unk_index:
                    raise SystemExit("dictionary has no '|' word separator")
                lexicon = LexiconDecoder(
                    args.lexicon, list(dictionary.symbols),
                    arpa_path=args.lm_path, blank=cfg.blank_id, sep=sep_id,
                    lm_weight=args.lm_weight, word_score=args.word_score,
                    beam=args.ctc_beam_size,
                )
            decode_rows = RescoreDecoder(
                model, shard_vars(variables),
                blank_id=cfg.blank_id, eos_id=cfg.eos_id, pad_id=cfg.pad_id,
                nbest=args.rescore_nbest, beam=args.ctc_beam_size,
                topk=args.ctc_topk, ctc_weight=args.ctc_weight,
                max_len=args.max_len, lexicon=lexicon,
            )
        else:
            from ..decode.asr import CTCDecoder

            if ensemble:
                raise SystemExit("--ensemble-last requires --decoder beam")
            lexicon = None
            if args.decoder == "ctc_lexicon":
                from ..decode.lexicon import LexiconDecoder

                if not args.lexicon:
                    raise SystemExit("--decoder ctc_lexicon needs --lexicon")
                sep_id = dictionary.index("|")
                if sep_id == dictionary.unk_index:
                    raise SystemExit("dictionary has no '|' word separator")
                lexicon = LexiconDecoder(
                    args.lexicon, list(dictionary.symbols),
                    arpa_path=args.lm_path, blank=cfg.blank_id, sep=sep_id,
                    lm_weight=args.lm_weight, word_score=args.word_score,
                    beam=args.ctc_beam_size,
                )
            decode_rows = CTCDecoder(model, shard_vars(variables),
                                     blank_id=cfg.blank_id, lexicon=lexicon)

        refs, hyps = [], []
        for s in range(0, n, args.batch_size):
            idxs = order[s : s + args.batch_size]
            items = [ds[i] for i in idxs]
            if mesh is not None and len(items) < args.batch_size:
                # pad the tail batch to the full sharded size; padded rows
                # decode garbage that is simply never read back
                items = items + [items[-1]] * (args.batch_size - len(items))
            batch = ds.collate(items, cfg.eos_id, cfg.pad_id)
            wav = jnp.asarray(batch["wav"])
            wlen = jnp.asarray(batch["wav_lengths"])
            if mesh is not None:
                from ..parallel.sharding import shard_decode_batch

                wav, wlen = shard_decode_batch((wav, wlen), mesh)
            token_rows = decode_rows(wav, wlen)
            for b, i in enumerate(idxs):
                hyps.append(letters_to_text(dictionary.string(token_rows[b])))
                refs.append(letters_to_text(ds.label_lines[i]))
        scorer = corpus_bleu if args.metric == "bleu" else corpus_wer
        result = {"metric": args.metric, "value": scorer(refs, hyps),
                  "n_utts": n}
        if args.decoder != "beam":
            result["decoder"] = args.decoder
        if args.results_path:
            with open(os.path.join(args.results_path, "hyps.txt"), "w") as f:
                f.write("\n".join(hyps) + "\n")
            with open(os.path.join(args.results_path, "refs.txt"), "w") as f:
                f.write("\n".join(refs) + "\n")

    elif args.task == "s2c":
        from ..decode.sid import SIDClassifier

        clf = SIDClassifier(model, variables)
        correct = 0
        for s in range(0, n, args.batch_size):
            idxs = order[s : s + args.batch_size]
            items = [ds[i] for i in idxs]
            batch = ds.collate(items)
            pred = np.asarray(clf(jnp.asarray(batch["wav"]),
                                  jnp.asarray(batch["wav_lengths"])))
            correct += int((pred == batch["targets"]).sum())
        result = {"metric": "accuracy", "value": correct / max(n, 1),
                  "n_utts": n}

    else:  # t2s / s2s
        from ..decode.tts import TTSDecoder

        tts = TTSDecoder(model, variables, max_frames=args.max_frames)
        mcds, focus_rates = [], []
        for s in range(0, n, args.batch_size):
            idxs = order[s : s + args.batch_size]
            items = [ds[i] for i in idxs]
            if args.task == "t2s":
                batch = ds.collate(items, cfg.eos_id, cfg.pad_id)
                out = tts.text_to_speech(
                    jnp.asarray(batch["tokens"]),
                    jnp.asarray(batch["spkembs"]) if "spkembs" in batch else None,
                )
            else:
                batch = ds.collate(items)
                out = tts.speech_to_speech(
                    jnp.asarray(batch["wav"]),
                    jnp.asarray(batch["wav_lengths"]),
                    jnp.asarray(batch["spkembs"]),
                )
            mel = np.asarray(out.mel)
            lens = np.asarray(out.lengths)
            focus = (np.asarray(out.focus_rate)
                     if out.focus_rate is not None else None)
            for b, i in enumerate(idxs):
                hyp_mel = mel[b, : int(lens[b])]
                ref_mel = items[b]["mel"]
                mcds.append(mcd(ref_mel, hyp_mel))
                if focus is not None:
                    focus_rates.append(float(focus[b]))
                if args.results_path:
                    np.save(os.path.join(args.results_path, f"{i}.npy"),
                            hyp_mel)
                    if args.griffin_lim:
                        # checkpoint-free waveform next to the mel dump —
                        # the reference needs an external vocoder binary to
                        # hear its dumps (generate_speech.py:156-189)
                        from ..data.audio import write_wav
                        from ..ops.mel import mel_to_audio

                        write_wav(
                            os.path.join(args.results_path, f"{i}.wav"),
                            mel_to_audio(hyp_mel, n_mels=cfg.n_mels),
                        )
        result = {"metric": "mcd", "value": float(np.mean(mcds)), "n_utts": n}
        if focus_rates:
            result["focus_rate"] = float(np.mean(focus_rates))

    result["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
