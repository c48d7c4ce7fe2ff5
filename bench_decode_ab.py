"""A/B: ancestry-indexed vs gathered beam-cache reorder on one TPU chip.

The decode-step differential (bench_decode_breakdown.py) attributed ~73% of
the AR-step cost at L=170 to length-proportional cache traffic: the beam
reorder physically gathers every KV-cache leaf each step (read+write) and
attention re-reads the result.  cache_reorder="ancestry" keeps the caches
unpermuted and shuffles an [N, L+1] int32 ancestor map instead; attention
reads the caches through one flattened gather.

Prints one JSON line with both timings.  Usage: python bench_decode_ab.py
[--batch 32] [--max-len 170]
"""

import argparse
import json
import sys
import time

import numpy as np

T0 = time.time()


def note(msg):
    print(f"[decode_ab {time.time()-T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--max-len", type=int, default=170)
    ap.add_argument("--min-len", type=int, default=130)
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

    out = {"metric": "asr_decode_cache_reorder_ab", "batch": B,
           "max_len": args.max_len}
    results = {}
    for mode in ("ancestry", "gather"):
        dec = ASRDecoder(
            model, variables, beam_size=5, max_len=args.max_len,
            ctc_weight=0.3, min_len=args.min_len, cache_reorder=mode,
        )
        res = dec(wavs[0], lengths)
        float(jnp.sum(res.scores))
        note(f"{mode}: compiled")
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            res = dec(wavs[1 + i], lengths)
            float(jnp.sum(res.scores))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[len(ts) // 2]
        results[mode] = res
        out[f"{mode}_ms"] = round(dt * 1e3, 1)
        out[f"{mode}_x_realtime"] = round(B * args.secs / dt, 1)
        note(f"{mode}: {dt*1e3:.1f} ms/batch "
             f"-> {B*args.secs/dt:.0f}x realtime")

    same_tokens = bool(
        np.array_equal(np.asarray(results["ancestry"].tokens),
                       np.asarray(results["gather"].tokens))
    )
    out["tokens_match"] = same_tokens
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
