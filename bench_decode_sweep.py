"""Sweep the ASR decode operating point at honest char-level geometry.

Round-2 finding (PERF.md §4): at L=170 the AR beam step carries a ~12.7
ms/step fixed floor that is backend while_loop per-iteration overhead, not
FLOPs or HBM — i.e. ~64% of the step.  A fixed floor amortizes with batch
(more audio per iteration) and with steps_per_iter (fewer loop iterations
per token).  Round-1 pinned BATCH=32 from a knee swept at the old 40-token
geometry; this sweep re-finds the knee at the honest one
(vocab 81, min_len 130 / max_len 170, beam 5 + CTC prefix).

Usage: python bench_decode_sweep.py [--batches 32,64,128] [--spi 4,8,16]
Writes one JSON line per point to stdout and a summary file.
"""

import argparse
import json
import sys
import time

import numpy as np

T0 = time.time()


def note(msg):
    print(f"[sweep {time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128")
    ap.add_argument("--spi", default="4,8,16")
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--max-len", type=int, default=170)
    ap.add_argument("--min-len", type=int, default=130)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/tmp/decode_sweep.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    note(f"devices: {jax.devices()}")

    from speecht5_tpu.config import speecht5_base_asr
    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.decode.asr import ASRDecoder

    cfg = speecht5_base_asr(dtype="bfloat16")
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

    T = int(args.secs * 16000)
    rng = np.random.default_rng(0)
    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        # fresh inputs per iteration: memoizing backend (PERF.md §1)
        wavs = [jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.05
                for _ in range(args.iters + 1)]
        lengths = jnp.full((B,), T, jnp.int32)
        for spi in [int(s) for s in args.spi.split(",")]:
            dec = ASRDecoder(
                model, variables, beam_size=5, max_len=args.max_len,
                ctc_weight=0.3, min_len=args.min_len, steps_per_iter=spi,
            )
            t_c = time.perf_counter()
            try:
                res = dec(wavs[0], lengths)
                float(jnp.sum(res.scores))
            except Exception as e:
                note(f"B={B} spi={spi}: FAILED {e!r}")
                rows.append({"batch": B, "steps_per_iter": spi,
                             "error": repr(e)[:200]})
                continue
            compile_s = time.perf_counter() - t_c
            ts = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                res = dec(wavs[1 + i], lengths)
                float(jnp.sum(res.scores))
                ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[len(ts) // 2]
            x_rt = B * args.secs / dt
            row = {"batch": B, "steps_per_iter": spi,
                   "ms": round(dt * 1e3, 1),
                   "x_realtime": round(x_rt, 1),
                   "compile_s": round(compile_s, 1)}
            rows.append(row)
            note(f"B={B} spi={spi}: {dt*1e3:.0f} ms -> {x_rt:.0f}x realtime "
                 f"(compile {compile_s:.0f}s)")
            print(json.dumps(row), flush=True)

    best = max((r for r in rows if "x_realtime" in r),
               key=lambda r: r["x_realtime"], default=None)
    out = {"metric": "asr_decode_operating_point_sweep",
           "max_len": args.max_len, "min_len": args.min_len,
           "rows": rows, "best": best}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"best": best}), flush=True)
    note(f"done -> {args.out}")


if __name__ == "__main__":
    main()
