"""Chip A/B of the s2t decode operating points: CTC greedy vs two-pass
CTC->attention rescore vs the joint AR beam's published number.

The rescore path (decode/asr.RescoreDecoder) replaces the AR beam's serial
decode loop with two batched forwards — encoder+CTC N-best (pass 1, host
prefix beam over device posteriors) and one teacher-forced decoder scoring
forward over all B*nbest hypotheses (pass 2).  This measures where that
lands between the greedy (2379x realtime, PERF.md section 11) and beam
(136x) points.

Prints one JSON line.  Usage: python bench_rescore.py [--batch 32]
"""

import argparse
import json
import sys
import time

import numpy as np

T0 = time.time()


def note(msg):
    print(f"[rescore {time.time()-T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--nbest", type=int, default=8)
    ap.add_argument("--beam", type=int, default=16)
    ap.add_argument("--topk", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=170)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    note(f"devices: {jax.devices()}")

    from speecht5_tpu.config import speecht5_base_asr
    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.decode.asr import CTCDecoder, RescoreDecoder

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
    wav = jnp.asarray(rng.standard_normal((B, T)) * 0.1, jnp.float32)
    lens_np = rng.integers(int(0.8 * T), T + 1, size=(B,))
    lens = jnp.asarray(lens_np, jnp.int32)
    audio_s = float(lens_np.sum()) / 16000.0

    def timed(fn, label):
        t0 = time.time()
        fn()  # warm twice: compile + caches (rescore L-bucket included)
        fn()
        note(f"{label} warm {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(args.iters):
            fn()
        dt = (time.time() - t0) / args.iters
        return dt

    greedy = CTCDecoder(model, variables, blank_id=cfg.blank_id)
    rescore = RescoreDecoder(
        model, variables, blank_id=cfg.blank_id, eos_id=cfg.eos_id,
        pad_id=cfg.pad_id, nbest=args.nbest, beam=args.beam,
        topk=args.topk, ctc_weight=0.3, max_len=args.max_len,
    )

    g_dt = timed(lambda: greedy(wav, lens), "greedy")
    r_dt = timed(lambda: rescore(wav, lens), "rescore")

    # emission-realistic variant: random-init CTC posteriors are near-uniform
    # (no blank dominance, hypotheses grow to the max-len clamp) — worst case
    # for pass 1.  Trained CTC models emit mostly blank frames; bias the CTC
    # head's blank logit to reproduce that emission density and re-time.
    bias = np.array(variables["params"]["encoder"]["proj"]["bias"])
    bias[cfg.blank_id] += 9.0
    real_vars = dict(variables)
    real_vars["params"] = dict(variables["params"])
    real_vars["params"]["encoder"] = dict(variables["params"]["encoder"])
    real_vars["params"]["encoder"]["proj"] = {
        **variables["params"]["encoder"]["proj"],
        "bias": jnp.asarray(bias),
    }
    rescore_real = RescoreDecoder(
        model, real_vars, blank_id=cfg.blank_id, eos_id=cfg.eos_id,
        pad_id=cfg.pad_id, nbest=args.nbest, beam=args.beam,
        topk=args.topk, ctc_weight=0.3, max_len=args.max_len,
    )
    rr_dt = timed(lambda: rescore_real(wav, lens), "rescore-realistic")
    rlp = np.asarray(rescore_real._enc(rescore_real.variables, (wav, lens))[2])
    blank_frac = float((np.exp(rlp[..., cfg.blank_id]) > 0.95).mean())

    # host-side pass-1 share: posteriors once, nbest on host
    lp, lengths = rescore._enc(rescore.variables, (wav, lens))[2:]
    lp_h, len_h = np.asarray(lp), np.asarray(lengths)
    from speecht5_tpu.decode.nbest import ctc_nbest
    t0 = time.time()
    for b in range(B):
        ctc_nbest(lp_h[b, : int(len_h[b])], blank=cfg.blank_id,
                  beam=args.beam, nbest=args.nbest, topk=args.topk)
    nbest_dt = time.time() - t0

    print(json.dumps({
        "metric": "decode_ms_per_batch",
        "batch": B, "audio_s_per_batch": audio_s,
        "greedy_ms": round(g_dt * 1e3, 1),
        "greedy_x_realtime": round(audio_s / g_dt, 1),
        "rescore_ms": round(r_dt * 1e3, 1),
        "rescore_x_realtime": round(audio_s / r_dt, 1),
        "rescore_realistic_ms": round(rr_dt * 1e3, 1),
        "rescore_realistic_x_realtime": round(audio_s / rr_dt, 1),
        "realistic_blank_frame_frac": round(blank_frac, 3),
        "rescore_nbest_host_ms": round(nbest_dt * 1e3, 1),
        "nbest": args.nbest, "beam": args.beam, "topk": args.topk,
    }))


if __name__ == "__main__":
    main()
