"""Benchmark: SpeechT5-Base inference throughput on one TPU chip.

Primary metric: ASR decode throughput — waveform -> conv prenet -> 12-layer
encoder (+CTC head) -> jitted joint CTC/attention beam search (beam 5) with KV
cache — as multiples of realtime audio per chip.  BASELINE.json north star:
>= 50x realtime (the reference's joint CTC decode is batch=1 with per-step CPU
hops through espnet CTCPrefixScore, reference sequence_generator.py:346-654;
here the whole batch decodes in one device program).

Decode geometry is the HONEST char-level one: vocab 81 (the SpeechT5 char SPM;
HF microsoft/speecht5_asr vocab is 81) and hypotheses forced to >= 130 tokens
for 10 s utterances (~150 words/min ~= 140 chars/10 s; the reference decodes
with --max-len-a 0 --max-len-b 620 as the CAP, reference
SpeechT5/README.md:243-244).  Random weights would emit EOS immediately, so
min_len pins the AR loop to realistic trip counts.

Secondary: TTS autoregressive mel decode RTF incl. in-graph HiFi-GAN —
batch-4 throughput RTF and batch-1 latency RTF (the number a serving stack
cares about; the reference loop is batch=1 O(T^2),
reference models/speecht5.py:1222-1245).

Also reports measured MFU (analytical FLOPs / time / chip bf16 peak, see
speecht5_tpu/utils/flops.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Phase timestamps go to stderr so a timeout is diagnosable from the artifact.
"""

import json
import os
import sys
import time

import numpy as np

T0 = time.time()


def ph(name):
    print(f"[bench {time.time()-T0:7.1f}s] {name}", file=sys.stderr, flush=True)


def main():
    ph("start")
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # default "xla_gpu_per_fusion_autotune_cache_dir" embeds the ABSOLUTE
    # cache path into the compile options and hence the cache key: a fresh
    # checkout at any other path cold-misses the committed cache.  Disable
    # the XLA-side cache so keys depend only on program + backend.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    import jax.numpy as jnp

    ph(f"devices: {jax.devices()}")

    from speecht5_tpu.config import speecht5_base_asr
    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.decode.asr import ASRDecoder
    from speecht5_tpu.decode.tts import TTSDecoder
    from speecht5_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from speecht5_tpu.utils import flops as F

    def cache_entries():
        try:
            return len(os.listdir(cache_dir))
        except OSError:
            return 0

    # ---------------------------------------------------------------- ASR
    # Batch sweep on v5e-lite (10 s utts, beam 5, char-level geometry below):
    # see README benchmark table; BATCH is the measured per-chip knee.
    BATCH = int(os.environ.get("BENCH_BATCH", "32"))
    AUDIO_SECONDS = 10.0
    SR = 16000
    T = int(AUDIO_SECONDS * SR)
    BEAM = 5
    # char-level hypothesis geometry: ~14 chars/s of speech -> ~130-170
    # tokens for 10 s.  min_len forces realistic trip counts on random
    # weights; max_len bounds the static loop.
    MAX_LEN = 170
    MIN_LEN = 130

    cfg = speecht5_base_asr(dtype="bfloat16")   # vocab_size=81 (char SPM)
    x = jnp.zeros((8,))
    jax.block_until_ready(x)
    ph("first device op done (backend session up)")
    # init on the host CPU backend, then one bulk transfer: the remote axon
    # backend executes the big init program 5-13x slower than the host
    # (measured 181-502s remote vs ~37s host for the same init)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            model, variables = init_model(cfg, jax.random.PRNGKey(0))
            jax.block_until_ready(variables)
        ph("init_model done on host cpu")
        variables = jax.device_put(variables, jax.devices()[0])
        jax.block_until_ready(variables)
        ph("params transferred to device")
    except RuntimeError:  # no cpu backend: init directly on the device
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        jax.block_until_ready(variables)
        ph("init_model done")

    decoder = ASRDecoder(
        model, variables, beam_size=BEAM, max_len=MAX_LEN,
        ctc_weight=0.3, min_len=MIN_LEN,
    )

    rng = np.random.default_rng(0)
    # distinct inputs per iteration + host scalar fences: this environment's
    # remote backend memoizes (executable, inputs) -> result and its
    # block_until_ready can return early, so same-input timing lies
    wavs = [
        jnp.asarray(rng.standard_normal((BATCH, T)), jnp.float32) * 0.05
        for _ in range(4)
    ]
    lengths = jnp.full((BATCH,), T, jnp.int32)

    n_cache0 = cache_entries()
    t_c = time.perf_counter()
    res = decoder(wavs[0], lengths)
    float(jnp.sum(res.scores))
    compile_s = time.perf_counter() - t_c
    cache_hit = cache_entries() == n_cache0
    ph(f"ASR beam decode compiled in {compile_s:.1f}s "
       f"(persistent cache {'HIT' if cache_hit else 'MISS'})")

    iters = 3
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        res = decoder(wavs[1 + i], lengths)
        float(jnp.sum(res.scores))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    realtime_x = BATCH * AUDIO_SECONDS / dt
    # hypothesis lengths actually decoded -> AR trip count for the FLOP model
    hyp_lens = np.asarray(res.lengths)[:, 0]
    steps = int(hyp_lens.max())
    decode_flops = F.asr_decode_flops(cfg, BATCH, BEAM, T, steps)
    decode_mfu = F.mfu(decode_flops, dt)
    ph(f"ASR steady {dt*1000:.1f}ms/batch (median of {iters}), "
       f"hyp len mean {hyp_lens.mean():.0f} max {steps} "
       f"-> {realtime_x:.0f}x realtime, MFU {decode_mfu*100:.1f}%")

    # ------------------------------------------------------- CTC-only decode
    # Encoder+CTC-head viterbi decode (no AR loop) — the reference SpeechLM
    # eval contract (SpeechLM/speechlm/infer.py:29-33, infer_viterbi.yaml) and
    # the throughput operating point for no-LM ASR: one MXU-bound encoder
    # forward per batch, host-side greedy collapse.
    extras = {}
    try:
        from speecht5_tpu.decode.asr import CTCDecoder

        ctc_dec = CTCDecoder(model, variables, blank_id=cfg.blank_id)
        hyp_rows = ctc_dec(wavs[0], lengths)  # compile
        ph("CTC greedy decode compiled")
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            hyp_rows = ctc_dec(wavs[1 + i], lengths)
            ts.append(time.perf_counter() - t0)
        ctc_dt = sorted(ts)[len(ts) // 2]
        extras["ctc_decode_x_realtime"] = round(BATCH * AUDIO_SECONDS / ctc_dt, 1)
        T_enc = cfg.conv_features.out_length(T)
        enc_flops = (
            F.conv_frontend_flops(cfg, BATCH, T)
            + 2.0 * BATCH * T_enc * cfg.conv_features.layers[-1][0] * cfg.d_model
            + F.encoder_flops(cfg.encoder, BATCH, T_enc)
            + 2.0 * BATCH * T_enc * cfg.d_model * cfg.vocab_size
        )
        extras["ctc_decode_mfu"] = round(F.mfu(enc_flops, ctc_dt), 4)
        ph(f"CTC greedy steady {ctc_dt*1000:.1f}ms/batch "
           f"-> {extras['ctc_decode_x_realtime']:.0f}x realtime, "
           f"MFU {extras['ctc_decode_mfu']*100:.1f}%")
    except Exception as e:  # secondary metric; never lose the beam number
        ph(f"CTC decode bench failed: {e!r}")

    # ------------------------------------------- two-pass CTC -> att rescore
    # CTC N-best prefix beam (native, csrc ctc_nbest) + one teacher-forced
    # decoder forward over all B*nbest hypotheses — beam-level WER with no AR
    # loop (PERF.md §11b).  Random-init posteriors are near-uniform, so this
    # measures the WORST case for pass 1 (every hypothesis grows to max_len).
    try:
        from speecht5_tpu.decode.asr import RescoreDecoder

        rs_dec = RescoreDecoder(
            model, variables, blank_id=cfg.blank_id, eos_id=cfg.eos_id,
            pad_id=cfg.pad_id, nbest=8, beam=16, topk=8,
            ctc_weight=0.3, max_len=MAX_LEN,
        )
        rs_dec(wavs[0], lengths)  # compile (enc + score L-bucket)
        ph("CTC rescore decode compiled")
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            rs_dec(wavs[1 + i], lengths)
            ts.append(time.perf_counter() - t0)
        rs_dt = sorted(ts)[len(ts) // 2]
        extras["rescore_decode_x_realtime"] = round(
            BATCH * AUDIO_SECONDS / rs_dt, 1)
        ph(f"CTC rescore steady {rs_dt*1000:.1f}ms/batch "
           f"-> {extras['rescore_decode_x_realtime']:.0f}x realtime "
           f"(worst-case near-uniform posteriors)")
    except Exception as e:  # secondary metric; never lose the beam number
        ph(f"rescore decode bench failed: {e!r}")

    # ---------------------------------------------------------------- TTS
    try:
        # full-size HiFi-GAN v1 in the decode program: the RTF target includes
        # the vocoder (BASELINE.md; reference defers it to external torch)
        voc = HiFiGANGenerator(HiFiGANConfig())
        voc_vars = jax.jit(
            lambda: voc.init(jax.random.PRNGKey(2),
                             jnp.zeros((1, 8, cfg.n_mels)))
        )()
        spk1 = jnp.zeros((1, cfg.spk_embed_dim), jnp.float32)
        for tts_batch, key in ((4, "tts_rtf_incl_vocoder"),
                               (1, "tts_rtf_batch1_latency")):
            TOK = 64
            MAX_FRAMES = 512
            tts = TTSDecoder(
                model, variables, max_frames=MAX_FRAMES,
                min_len_ratio=3.9, max_len_ratio=4.0,  # ~256 steps on random
                vocoder=voc, vocoder_variables=voc_vars,
            )
            tokens = jnp.full((tts_batch, TOK), 5, jnp.int32)
            spk = jnp.zeros((tts_batch, cfg.spk_embed_dim), jnp.float32)
            out = tts.text_to_speech(tokens, spk)
            float(jnp.sum(out.lengths))
            ph(f"TTS AR decode + vocoder compiled (batch {tts_batch})")
            ts = []
            for i in range(3):  # fresh input each time (memoizing backend)
                tokens_i = jnp.full((tts_batch, TOK), 7 + i, jnp.int32)
                t0 = time.perf_counter()
                out = tts.text_to_speech(tokens_i, spk)
                float(jnp.sum(out.lengths))
                ts.append(time.perf_counter() - t0)
            tts_dt = sorted(ts)[1]
            frames = int(np.asarray(out.lengths).min())
            audio_s = frames * 256 / SR  # hop 256 @ 16k
            rtf = tts_dt / max(tts_batch * audio_s, 1e-6)
            extras[key] = round(rtf, 4)
            ph(f"TTS steady {tts_dt*1000:.1f}ms for {frames} frames/utt "
               f"-> RTF {rtf:.4f} incl. HiFi-GAN (batch {tts_batch})")
        if "tts_rtf_incl_vocoder" in extras:
            extras["tts_rtf_vs_baseline"] = round(
                0.05 / extras["tts_rtf_incl_vocoder"], 2
            )
    except Exception as e:  # TTS is secondary; never lose the ASR number
        ph(f"TTS bench failed: {e!r}")

    # ---------------------------------------------------------------- train
    # Base-ASR fine-tune step (fwd+bwd+clip+adamw in ONE program), chained
    # donated dispatch per the PERF.md protocol: state feeds the next call so
    # the memoizing backend must execute every step; host fence at the end.
    try:
        from speecht5_tpu.train.trainer import Trainer, TrainConfig

        # rbg keys: the TPU hardware-RNG lowering the training CLI defaults
        # to (~10% faster step than threefry's vector program, PERF.md);
        # set here so the decode/TTS programs above stay byte-identical
        jax.config.update("jax_default_prng_impl", "rbg")
        TB, TSECS, TL, TSTEPS = 16, 10, 60, 10
        tcfg = TrainConfig(lr=1e-4, warmup_steps=100, ctc_weight=0.5)
        trainer = Trainer(model, variables, "s2t", tcfg)
        rng_t = np.random.default_rng(1)
        tbatch = {
            "wav": jnp.asarray(
                rng_t.standard_normal((TB, TSECS * SR)), jnp.float32) * 0.1,
            "wav_lengths": jnp.full((TB,), TSECS * SR, jnp.int32),
            "prev_tokens": jnp.asarray(
                rng_t.integers(4, cfg.vocab_size, (TB, TL)), jnp.int32),
            "targets": jnp.asarray(
                rng_t.integers(4, cfg.vocab_size, (TB, TL)), jnp.int32),
            "target_lengths": jnp.full((TB,), TL, jnp.int32),
        }
        key = jax.random.PRNGKey(1)
        key, sub = jax.random.split(key)
        loss0 = float(trainer.train_step(tbatch, sub)["loss"])  # compile
        ph(f"train step compiled, loss={loss0:.4f}")
        t0 = time.perf_counter()
        for _ in range(TSTEPS):
            key, sub = jax.random.split(key)
            m = trainer.train_step(tbatch, sub)
        loss_last = float(m["loss"])  # drains the pipelined chain
        tdt = time.perf_counter() - t0
        step_flops = F.s2t_train_flops(cfg, TB, TSECS * SR, TL)
        extras["train_ms_per_step"] = round(tdt / TSTEPS * 1e3, 1)
        extras["train_mfu"] = round(F.mfu(step_flops * TSTEPS, tdt), 4)
        extras["train_audio_s_per_s"] = round(TSTEPS * TB * TSECS / tdt, 1)
        extras["train_loss_first_last"] = [round(loss0, 3),
                                           round(loss_last, 3)]
        ph(f"train {tdt/TSTEPS*1e3:.1f}ms/step batch {TB} "
           f"-> MFU {extras['train_mfu']*100:.1f}%, "
           f"loss {loss0:.3f}->{loss_last:.3f}")
    except Exception as e:  # train segment must never lose the ASR number
        ph(f"train bench failed: {e!r}")

    out = {
        "metric": "speecht5_base_asr_beam5_ctc_decode_throughput",
        "value": round(realtime_x, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(realtime_x / 50.0, 3),
        "decode_mfu": round(decode_mfu, 4),
        "hyp_len_mean": round(float(hyp_lens.mean()), 1),
        "vocab_size": cfg.vocab_size,
        "batch": BATCH,
        "compile_s": round(compile_s, 1),
        "compile_cache_hit": cache_hit,
    }
    out.update(extras)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
