"""Per-segment timing of the SpeechT5 train step on one TPU chip.

Times forward segments (conv FE+encoder / decoder / CTC head) and the FULL
train step, each as N dependent iterations inside ONE jitted lax.fori_loop
(the carry perturbs the next input, so iterations can't be CSE'd or
memoized).  This measures pure device time: the remote-tunnel dispatch
latency of this environment (~25-30 ms per call, measured) would otherwise
dominate every sub-100 ms segment.

Each segment is reported against its analytical FLOPs (utils/flops.py).
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
    ap.add_argument("--iters", type=int, default=8)
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
    from speecht5_tpu.train.trainer import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
    )
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
    ITERS = args.iters

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
        """seconds/iter for ITERS dependent iterations in one program."""
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(
                0, ITERS, lambda i, c: make_step(c), x)

        r = run(init_x)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                      .astype(jnp.float32).ravel()[:1][0]))  # warm + fence
        fresh = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(1e-3, a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, init_x)
        t0 = time.perf_counter()
        r = run(fresh)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                      .astype(jnp.float32).ravel()[:1][0]))
        return (time.perf_counter() - t0) / ITERS

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
        def fe_step(w):
            h = model.apply(
                variables, w,
                method=lambda m, x: m.speech_encoder_prenet.feature_extractor(x))
            return w + h.astype(jnp.float32).mean() * 1e-6

        dt_fe = device_loop_time(fe_step, wav)
        report("conv FE only", dt_fe, F.conv_frontend_flops(cfg, B, T))

        def conv_step(w):
            h = model.apply(variables, w, wav_lengths, mask=False,
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
            v, w, wav_lengths, mask=False, deterministic=True,
            method=lambda m, a, b: m.speech_encoder_prenet(
                a, b, mask=False, deterministic=True)))(variables, wav)
        jax.block_until_ready(feats)

        def encstack_step(h):
            out = model.apply(
                variables, h, feats_valid,
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

        def dec_step(e):
            logits = model.apply(variables, e, prev, deterministic=True,
                                 method="decode_text")
            return _perturb(e, logits)

        dt_dec = device_loop_time(dec_step, enc_out)
        f_dec = (F.decoder_teacher_flops(cfg.decoder, B, L, T_enc)
                 + 2.0 * B * L * cfg.d_model * cfg.vocab_size)
        report("decoder+logits", dt_dec, f_dec)

        def ctc_step(e):
            logits = model.apply(variables, e, method="ctc_logits")
            return _perturb(e, logits)

        dt_ctc = device_loop_time(ctc_step, enc_out)
        report("ctc head", dt_ctc,
               2.0 * B * T_enc * cfg.d_model * cfg.vocab_size)
        fwd_time = dt + dt_dec + dt_ctc

    # ---- full train step (fwd+bwd+clip+adamw), fori_loop over steps ----
    tcfg = TrainConfig(lr=1e-4, warmup_steps=100, ctc_weight=0.5)
    tx = make_optimizer(tcfg)
    step_fn = make_train_step(model, "s2t", tcfg)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    state0 = TrainState(params, tx.init(params),
                        jnp.zeros((), jnp.int32), extra)
    batch = {
        "wav": wav, "wav_lengths": wav_lengths, "prev_tokens": prev,
        "targets": prev, "target_lengths": jnp.full((B,), L, jnp.int32),
    }

    @jax.jit
    def run_steps(state, key):
        def body(i, st):
            st, m = step_fn(st, batch, jax.random.fold_in(key, i))
            return st
        return jax.lax.fori_loop(0, ITERS, body, state)

    st = run_steps(state0, jax.random.PRNGKey(1))
    float(st.step)  # warm + fence
    t0 = time.perf_counter()
    st = run_steps(st, jax.random.PRNGKey(2))
    float(st.step)
    dt_step = (time.perf_counter() - t0) / ITERS
    f_step = F.s2t_train_flops(cfg, B, T, L)
    report("train step", dt_step, f_step)

    print(json.dumps({
        "metric": f"speecht5_{args.arch}_train_breakdown",
        "batch": B, "utt_secs": args.secs,
        "timing": "device fori_loop (dispatch-free)",
        "overrides": args.override,
        "segments": rows,
        "fwd_segments_ms": (round(fwd_time * 1e3, 2)
                            if fwd_time is not None else None),
        "train_step_ms": round(dt_step * 1e3, 2),
        "train_mfu": round(f_step / dt_step / peak, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
