"""Differential timing of the jitted ASR beam-decode loop on one TPU chip.

The AR while_loop dominates end-to-end ASR decode at honest char-level
hypothesis lengths (bench.py).  This script isolates where a decode step's
time goes by differencing full-decode configurations:

  encoder-only              -> encoder + CTC head cost
  decode len A vs len B     -> marginal cost per AR step
  ctc_weight 0.3 vs 0.0     -> CTC prefix-scoring cost per step
  beam 5 vs beam 1          -> beam-width-dependent cost (KV gather etc.)

Evidence artifact for the decode perf pass (not the driver bench — bench.py).
Usage: python bench_decode_breakdown.py [--batch 32]
"""

import argparse
import json
import sys
import time

import numpy as np

T0 = time.time()


def note(msg):
    print(f"[decode_breakdown {time.time()-T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    note(f"devices: {jax.devices()}")

    from speecht5_tpu.config import speecht5_base_asr
    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.decode.asr import ASRDecoder

    cfg = speecht5_base_asr(dtype="bfloat16")
    B, T = args.batch, int(args.secs * 16000)

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
    wavs = [jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.05
            for _ in range(args.iters + 1)]
    lengths = jnp.full((B,), T, jnp.int32)

    def timed(fn):
        fn(wavs[0])  # compile + warm
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            fn(wavs[1 + i])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    rows = {}

    # encoder + CTC head only
    enc_fn = jax.jit(lambda v, w: model.apply(
        v, w, lengths, mask=False, deterministic=True,
        method="encode_speech", with_ctc=True))

    def run_enc(w):
        out = enc_fn(variables, w)
        float(jnp.sum(out["ctc_logits"].astype(jnp.float32)[:, 0, 0]))

    rows["encoder_ctc_ms"] = timed(run_enc) * 1e3
    note(f"encoder+ctc: {rows['encoder_ctc_ms']:.1f} ms")

    def decode_time(beam, ctc_w, min_len, max_len):
        dec = ASRDecoder(model, variables, beam_size=beam, max_len=max_len,
                         ctc_weight=ctc_w, min_len=min_len)

        def run(w):
            res = dec(w, lengths)
            float(jnp.sum(res.scores))
        dt = timed(run)
        note(f"beam={beam} ctc={ctc_w} len[{min_len},{max_len}]: "
             f"{dt*1e3:.1f} ms")
        return dt

    base_hi = decode_time(5, 0.3, 130, 170)
    base_lo = decode_time(5, 0.3, 60, 100)
    noctc_hi = decode_time(5, 0.0, 130, 170)
    noctc_lo = decode_time(5, 0.0, 60, 100)
    beam1_hi = decode_time(1, 0.3, 130, 170)

    # marginal per-AR-step cost over the +70 steps between the two lengths
    step_ms = (base_hi - base_lo) / 70 * 1e3
    step_noctc_ms = (noctc_hi - noctc_lo) / 70 * 1e3
    rows.update({
        "decode_b5_ctc_len170_ms": base_hi * 1e3,
        "decode_b5_ctc_len100_ms": base_lo * 1e3,
        "decode_b5_noctc_len170_ms": noctc_hi * 1e3,
        "decode_b1_ctc_len170_ms": beam1_hi * 1e3,
        "ar_step_ms": step_ms,
        "ar_step_noctc_ms": step_noctc_ms,
        "ar_step_ctc_overhead_ms": step_ms - step_noctc_ms,
    })
    print(json.dumps({
        "metric": "speecht5_base_asr_decode_breakdown",
        "batch": B, "utt_secs": args.secs,
        **{k: round(v, 2) for k, v in rows.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
