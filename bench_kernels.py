"""Micro-benchmarks: Pallas kernels vs the XLA paths on one TPU chip.

Run directly (`python bench_kernels.py`); prints one JSON line per kernel.
Not the driver bench (that's bench.py) — this is the evidence artifact for
kernel-level numbers.

Timing method: N dependent iterations inside ONE jitted lax.fori_loop (the
input is perturbed by the carry so iterations can't be CSE'd), so the
measurement is pure device time — the remote-tunnel dispatch latency and
result caching of this environment can't distort it.
"""

import json
import sys
import time

import numpy as np

ITERS = 50


def device_loop_time(make_step, init_x):
    """make_step(x) -> y with y.shape == x.shape; returns seconds/iter.

    The timed call uses a DIFFERENT input from the warmup: this environment's
    remote backend memoizes (executable, inputs) -> result, so re-timing the
    warmup input measures a cache hit, not the device.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: make_step(c), x)

    r = run(init_x)
    float(jnp.mean(r.astype(jnp.float32)))  # compile + warm, host fence
    fresh = init_x + jnp.asarray(1e-3, init_x.dtype)
    t0 = time.perf_counter()
    r = run(fresh)
    # block_until_ready can return before remote execution completes on this
    # backend; a host scalar fetch is the only reliable fence
    float(jnp.mean(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    from speecht5_tpu.ops.mel import log_mel_spectrogram
    from speecht5_tpu.ops.pallas_kernels import (
        fused_log_mel, flash_attention_bias,
    )
    from speecht5_tpu.models.attention import relative_bias

    rng = np.random.default_rng(0)

    # ---- log-mel: 8 x 10 s @ 16 kHz ----
    wav = jnp.asarray(rng.standard_normal((8, 160000)), jnp.float32) * 0.2

    def step_xla(w):
        mel = log_mel_spectrogram(w)
        return w + mel.mean() * 1e-6  # carry dependence, same shape

    def step_pallas(w):
        mel = fused_log_mel(w)
        return w + mel.mean() * 1e-6

    t_xla = device_loop_time(step_xla, wav)
    t_pl = device_loop_time(step_pallas, wav)
    ref = np.asarray(log_mel_spectrogram(wav))
    got = np.asarray(fused_log_mel(wav))
    err = float(np.abs(ref - got).max())
    print(json.dumps({
        "kernel": "log_mel_8x10s_audio",
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_ms": round(t_pl * 1e3, 3),
        "speedup": round(t_xla / t_pl, 2),
        "max_abs_err": round(err, 6),
    }), flush=True)

    # ---- attention with rel-pos bias: encoder-shaped ----
    B, H, T, Dh, M = 8, 12, 512, 64, 160
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.bfloat16) * 0.2
    k = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.bfloat16) * 0.2
    v = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.bfloat16)
    table = jnp.asarray(rng.standard_normal((2 * M, Dh)), jnp.bfloat16) * 0.1
    pos = jnp.arange(T)
    valid = jnp.ones((B, T), bool)

    def xla_attn(q):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits += relative_bias(q, table, pos, pos, M).astype(jnp.float32)
        logits = jnp.where(valid[:, None, None, :], logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", w, v)

    def pallas_attn(q):
        bias = relative_bias(q, table, pos, pos, M).astype(jnp.bfloat16)
        qf = q.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
        kf = k.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
        vf = v.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
        bf = bias.reshape(B * H, T, T)
        o = flash_attention_bias(qf, kf, vf, bf, block_q=256, block_k=512)
        return o.reshape(B, H, T, Dh).transpose(0, 2, 1, 3)

    from speecht5_tpu.ops.pallas_kernels import banded_flash_attention
    from speecht5_tpu.models.attention import band_from_table

    def banded_attn(q):
        band = band_from_table(table, T, M)
        qf = q.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
        kf = k.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
        vf = v.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
        o = banded_flash_attention(qf, kf, vf, band)
        return o.reshape(B, H, T, Dh).transpose(0, 2, 1, 3)

    t_banded = device_loop_time(lambda x: x + banded_attn(x) * 1e-3, q)
    t_xla = device_loop_time(lambda x: x + xla_attn(x) * 1e-3, q)
    t_pl = device_loop_time(lambda x: x + pallas_attn(x) * 1e-3, q)
    ref = np.asarray(xla_attn(q), np.float32)
    got = np.asarray(pallas_attn(q), np.float32)
    got_banded = np.asarray(banded_attn(q), np.float32)
    err = float(np.abs(ref - got).max())
    err_banded = float(np.abs(ref - got_banded).max())
    print(json.dumps({
        "kernel": "attn_relpos_B8_H12_T512",
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_streaming_ms": round(t_pl * 1e3, 3),
        "pallas_banded_ms": round(t_banded * 1e3, 3),
        "banded_speedup": round(t_xla / t_banded, 2),
        "max_abs_err_streaming": round(err, 6),
        "max_abs_err_banded": round(err_banded, 6),
    }), flush=True)


def conv_stack_bench():
    """Fused conv-FE stack vs XLA conv chain at base-FE shapes (the
    round-3 kernel; in-context step A/Bs rejected it — PERF.md §8 — this
    is the isolated-kernel view)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    from speecht5_tpu.ops.pallas_kernels import (
        conv_stack_pallas, _conv_stack_ref,
    )

    rng = np.random.default_rng(0)
    B, T, C = 8, 32000, 512   # conv0 output geometry for 10 s audio
    specs = ((3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2))
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((k, C, C)) * 0.02, jnp.bfloat16)
          for k, _ in specs]

    xla = jax.jit(lambda x: _conv_stack_ref(x, ws, specs))
    pallas = jax.jit(lambda x: conv_stack_pallas(x, ws, specs))
    t_xla = device_loop_time(
        lambda x: x + jnp.pad(
            xla(x).astype(x.dtype) * 1e-3,
            ((0, 0), (0, T - xla(x).shape[1]), (0, 0))), x)
    t_pl = device_loop_time(
        lambda x: x + jnp.pad(
            pallas(x).astype(x.dtype) * 1e-3,
            ((0, 0), (0, T - pallas(x).shape[1]), (0, 0))), x)
    ref = np.asarray(xla(x), np.float32)
    got = np.asarray(pallas(x), np.float32)
    err = float(np.abs(ref - got).max())
    print(json.dumps({
        "kernel": "conv_fe_stack_B8_T32k_C512",
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_ms": round(t_pl * 1e3, 3),
        "speedup": round(t_xla / t_pl, 2),
        "max_abs_err": round(err, 5),
    }), flush=True)


if __name__ == "__main__":
    main()
    conv_stack_bench()
