"""Per-segment timing of the SpeechT5 train step on one TPU chip.

Times forward segments (conv FE+encoder / decoder / CTC head) and the FULL
train step against analytical FLOPs (utils/flops.py).

Timing protocol (this environment's remote 'axon' backend):
  - per-call dispatch costs ~25-50 ms, so sub-100 ms segments are timed as
    K dependent iterations UNROLLED inside one jitted program (the carry
    perturbs the next input, so iterations can't be CSE'd), chained over a
    few dispatches;
  - the full train step is timed as chained dispatches with donated state
    (the dependency chain forces execution; the device step time exceeds
    the dispatch cost, so dispatch pipelines behind the device);
  - lax.fori_loop over train steps is NOT used: on this backend the same
    step program wrapped in a fori_loop executes 24-100x slower with high
    run-to-run variance (3.6-17.6 s/step vs 0.15 s chained — measured,
    loop_probe.py shows plain matmul fori_loops run at full speed, so it
    is specific to large loop bodies here).

Evidence artifact for the profile-guided perf pass; the driver bench is
bench.py.  Usage: python bench_breakdown.py [--arch base|large] [--batch N]
"""

import argparse
import json
import sys
import time

import numpy as np

T0 = time.time()


def note(msg):
    print(f"[breakdown {time.time()-T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="base", choices=["base", "large"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--tgt-len", type=int, default=60)
    ap.add_argument("--unroll", type=int, default=4,
                    help="iterations unrolled per program for fwd segments")
    ap.add_argument("--chain", type=int, default=3,
                    help="chained dispatches per fwd segment measurement")
    ap.add_argument("--steps", type=int, default=12,
                    help="chained dispatches for the train-step measurement")
    ap.add_argument("--accum", type=int, default=1,
                    help="grad-accum microbatches (scan inside the step)")
    ap.add_argument("--override", action="append", default=[],
                    help="dotted config override, e.g. "
                         "encoder.attn_scores_f32=False (repeatable)")
    ap.add_argument("--train-only", action="store_true",
                    help="skip forward segments; time only the train step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_default_prng_impl", "rbg")
    note(f"devices: {jax.devices()}")

    from speecht5_tpu.config import speecht5_base, speecht5_large
    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.train.trainer import TrainConfig, Trainer
    from speecht5_tpu.utils import flops as F

    preset = speecht5_base if args.arch == "base" else speecht5_large
    cfg = preset(dtype="bfloat16")
    if args.override:
        from speecht5_tpu.config import apply_overrides
        cfg = apply_overrides(cfg, args.override)
        note(f"overrides: {args.override}")
    B, T = args.batch, int(args.secs * 16000)
    L = args.tgt_len
    T_enc = cfg.conv_features.out_length(T)
    peak = F.chip_peak_flops()

    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            model, variables = init_model(cfg, jax.random.PRNGKey(0))
            jax.block_until_ready(variables)
        variables = jax.device_put(variables, jax.devices()[0])
        jax.block_until_ready(variables)
    except RuntimeError:
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
    note("init done")

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.1
    wav_lengths = jnp.full((B,), T, jnp.int32)
    prev = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, L)), jnp.int32)

    def device_loop_time(make_step, init_x):
        """seconds/iter: UNROLL dependent iterations per program, CHAIN
        dispatched programs (dependent), one host fence at the end.

        ``make_step(variables, x) -> x``: the params are a jit ARGUMENT —
        closing over them would bake ~650 MB of literal constants into the
        unrolled HLO, which the remote-compile endpoint rejects (HTTP 413).

        Caveat: segments measured as standalone programs can be slower
        than the same ops inside the full train step (XLA picks different
        layouts/fusions in context) — treat them as relative guidance; the
        train-step row is the trustworthy absolute number."""
        K, C = args.unroll, args.chain

        @jax.jit
        def prog(v, x):
            for _ in range(K):
                x = make_step(v, x)
            return x

        r = prog(variables, init_x)
        jax.block_until_ready(r)  # compile + warm
        fresh = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(1e-3, a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, init_x)
        t0 = time.perf_counter()
        x = fresh
        for _ in range(C):
            x = prog(variables, x)
        float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                      .astype(jnp.float32).ravel()[:1][0]))
        return (time.perf_counter() - t0) / (K * C)

    rows = []

    def report(name, seconds, flops):
        rows.append({
            "segment": name,
            "ms": round(seconds * 1e3, 2),
            "tflops": round(flops / 1e12, 3),
            "achieved_tflops_s": round(flops / seconds / 1e12, 1),
            "pct_peak": round(flops / seconds / peak * 100, 1),
        })
        note(f"  {name:18s} {seconds*1e3:8.2f} ms  "
             f"{flops/seconds/1e12:7.1f} TF/s  "
             f"({flops/seconds/peak*100:5.1f}% peak)")

    # ---- forward segments (deterministic; no masking) ----
    fwd_time = None
    if not args.train_only:
        def fe_step(v, w):
            h = model.apply(
                v, w,
                method=lambda m, x: m.speech_encoder_prenet.feature_extractor(x))
            return w + h.astype(jnp.float32).mean() * 1e-6

        dt_fe = device_loop_time(fe_step, wav)
        report("conv FE only", dt_fe, F.conv_frontend_flops(cfg, B, T))

        def conv_step(v, w):
            h = model.apply(v, w, wav_lengths, mask=False,
                            deterministic=True, method="encode_speech")
            return w + h["encoder_out"].astype(jnp.float32).mean() * 1e-6

        dt = device_loop_time(conv_step, wav)
        c_fe = cfg.conv_features.layers[-1][0]
        f_conv_enc = (F.conv_frontend_flops(cfg, B, T)
                      + 2.0 * B * T_enc * c_fe * cfg.d_model
                      + F.encoder_flops(cfg.encoder, B, T_enc))
        report("prenet+encoder", dt, f_conv_enc)

        # encoder stack alone, on fixed prenet features
        feats, feats_valid, _, _ = jax.jit(lambda v, w: model.apply(
            v, w, wav_lengths,
            method=lambda m, a, b: m.speech_encoder_prenet(
                a, b, mask=False, deterministic=True)))(variables, wav)
        jax.block_until_ready(feats)

        def encstack_step(v, h):
            out = model.apply(
                v, h, feats_valid,
                method=lambda m, a, b: m.encoder(a, b, deterministic=True))
            return h + out["encoder_out"].astype(h.dtype).mean() * 1e-6

        dt_es = device_loop_time(encstack_step, feats)
        report("encoder stack", dt_es, F.encoder_flops(cfg.encoder, B, T_enc))

        enc_out = jax.jit(lambda v, w: model.apply(
            v, w, wav_lengths, mask=False, deterministic=True,
            method="encode_speech"))(variables, wav)
        jax.block_until_ready(enc_out)

        def _perturb(e, logits):
            d = logits.astype(jnp.float32).mean() * 1e-6
            return jax.tree_util.tree_map(
                lambda a: a + d.astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, e)

        def dec_step(v, e):
            logits = model.apply(v, e, prev, deterministic=True,
                                 method="decode_text")
            return _perturb(e, logits)

        dt_dec = device_loop_time(dec_step, enc_out)
        f_dec = (F.decoder_teacher_flops(cfg.decoder, B, L, T_enc)
                 + 2.0 * B * L * cfg.d_model * cfg.vocab_size)
        report("decoder+logits", dt_dec, f_dec)

        def ctc_step(v, e):
            logits = model.apply(v, e, method="ctc_logits")
            return _perturb(e, logits)

        dt_ctc = device_loop_time(ctc_step, enc_out)
        report("ctc head", dt_ctc,
               2.0 * B * T_enc * cfg.d_model * cfg.vocab_size)
        fwd_time = dt + dt_dec + dt_ctc

    # ---- full train step (fwd+bwd+clip+adamw), chained dispatch ----
    tcfg = TrainConfig(lr=1e-4, warmup_steps=100, ctc_weight=0.5,
                       accum_steps=args.accum)
    trainer = Trainer(model, variables, "s2t", tcfg)
    if args.accum > 1:
        A = args.accum
        Bm = max(B // A, 1)
        batch = {
            "wav": wav[: A * Bm].reshape(A, Bm, T),
            "wav_lengths": jnp.full((A, Bm), T, jnp.int32),
            "prev_tokens": prev[: A * Bm].reshape(A, Bm, L),
            "targets": prev[: A * Bm].reshape(A, Bm, L),
            "target_lengths": jnp.full((A, Bm), L, jnp.int32),
        }
    else:
        batch = {
            "wav": wav, "wav_lengths": wav_lengths, "prev_tokens": prev,
            "targets": prev, "target_lengths": jnp.full((B,), L, jnp.int32),
        }

    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    m = trainer.train_step(batch, sub)
    note(f"train step compiled, loss={float(m['loss']):.4f}")
    t0 = time.perf_counter()
    for _ in range(args.steps):
        key, sub = jax.random.split(key)
        m = trainer.train_step(batch, sub)
    float(m["loss"])  # fence: drains the dependent chain
    dt_step = (time.perf_counter() - t0) / args.steps
    f_step = F.s2t_train_flops(cfg, B, T, L)
    report("train step", dt_step, f_step)

    print(json.dumps({
        "metric": f"speecht5_{args.arch}_train_breakdown",
        "batch": B, "utt_secs": args.secs, "accum": args.accum,
        "timing": ("fwd: unrolled-in-jit chained; train: chained dispatch "
                   "w/ donated state"),
        "overrides": args.override,
        "segments": rows,
        "fwd_segments_ms": (round(fwd_time * 1e3, 2)
                            if fwd_time is not None else None),
        "train_step_ms": round(dt_step * 1e3, 2),
        "train_mfu": round(f_step / dt_step / peak, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
