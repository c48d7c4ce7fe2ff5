"""Per-segment timing of the SpeechT5 train step on one TPU chip.

Times independently-jitted forward segments (conv FE / encoder / decoder /
CTC head) plus the full forward and the full update at base-ASR training
shapes, each against its analytical FLOPs (utils/flops.py), to show where
the step spends time and what each segment's achieved TFLOP/s is.

Evidence artifact for the profile-guided perf pass; the driver bench is
bench.py.  Usage: python bench_breakdown.py [--arch base|large] [--batch N]
"""

import argparse
import json
import sys
import time

import numpy as np


def timed(fn, *args, iters=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="base", choices=["base", "large"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--tgt-len", type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    from speecht5_tpu.config import speecht5_base, speecht5_large
    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.train.trainer import Trainer, TrainConfig
    from speecht5_tpu.utils import flops as F

    preset = speecht5_base if args.arch == "base" else speecht5_large
    cfg = preset(dtype="bfloat16")
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
    print("init done", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.1
    wav_lengths = jnp.full((B,), T, jnp.int32)
    prev = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, L)), jnp.int32)

    rows = []

    def report(name, seconds, flops):
        rows.append({
            "segment": name,
            "ms": round(seconds * 1e3, 2),
            "tflops": round(flops / 1e12, 3),
            "achieved_tflops_s": round(flops / seconds / 1e12, 1),
            "pct_peak": round(flops / seconds / peak * 100, 1),
        })
        print(f"  {name:18s} {seconds*1e3:8.2f} ms  "
              f"{flops/seconds/1e12:7.1f} TF/s  "
              f"({flops/seconds/peak*100:5.1f}% peak)",
              file=sys.stderr, flush=True)

    # ---- forward segments (deterministic; no masking) ----
    conv = jax.jit(lambda v, w: model.apply(
        v, w, wav_lengths, mask=False, deterministic=True,
        method="encode_speech"))
    dt = timed(conv, variables, wav)
    c_fe = cfg.conv_features.layers[-1][0]
    f_conv_enc = (F.conv_frontend_flops(cfg, B, T)
                  + 2.0 * B * T_enc * c_fe * cfg.d_model
                  + F.encoder_flops(cfg.encoder, B, T_enc))
    report("prenet+encoder", dt, f_conv_enc)

    enc_out = conv(variables, wav)
    dec = jax.jit(lambda v, e, p: model.apply(
        v, e, p, deterministic=True, method="decode_text"))
    dt_dec = timed(dec, variables, enc_out, prev)
    f_dec = (F.decoder_teacher_flops(cfg.decoder, B, L, T_enc)
             + 2.0 * B * L * cfg.d_model * cfg.vocab_size)
    report("decoder+logits", dt_dec, f_dec)

    ctc = jax.jit(lambda v, e: model.apply(v, e, method="ctc_logits"))
    dt_ctc = timed(ctc, variables, enc_out)
    report("ctc head", dt_ctc, 2.0 * B * T_enc * cfg.d_model * cfg.vocab_size)

    # ---- full train step (fwd+bwd+clip+adamw) ----
    tcfg = TrainConfig(lr=1e-4, warmup_steps=100, ctc_weight=0.5)
    trainer = Trainer(model, variables, "s2t", tcfg)
    batch = {
        "wav": wav, "wav_lengths": wav_lengths, "prev_tokens": prev,
        "targets": prev, "target_lengths": jnp.full((B,), L, jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    m = trainer.train_step(batch, key)
    float(m["loss"])
    ts = []
    for i in range(10):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        m = trainer.train_step(batch, sub)
        float(m["loss"])
        ts.append(time.perf_counter() - t0)
    dt_step = sorted(ts)[len(ts) // 2]
    f_step = F.s2t_train_flops(cfg, B, T, L)
    report("train step", dt_step, f_step)

    fwd_time = dt + dt_dec + dt_ctc
    print(json.dumps({
        "metric": f"speecht5_{args.arch}_train_breakdown",
        "batch": B, "utt_secs": args.secs,
        "segments": rows,
        "fwd_segments_ms": round(fwd_time * 1e3, 2),
        "train_step_ms": round(dt_step * 1e3, 2),
        "train_mfu": round(f_step / dt_step / peak, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
