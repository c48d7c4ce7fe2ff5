"""Training-step throughput on one TPU chip (evidence artifact, not the
driver bench — that's bench.py).

Measures the full jitted update (fwd + bwd + clip + adamw) for SpeechT5-Base
ASR fine-tuning (s2t: CE + CTC, the reference's 100h recipe,
SpeechT5/README.md:96-119). The reference publishes no training-throughput
numbers, so this establishes the repo's own baseline: steps/s and audio
seconds/s per chip.

Protocol (this environment's remote backend — see bench.py): distinct batch
per step via the step RNG + donated state (state changes every call, so
result memoization can't trigger), dispatch pipelined over N steps, host
scalar fence only at the end.
"""

import json
import sys
import time

import numpy as np

STEPS = 20
B, SECS, L_TGT = 16, 10, 60


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_default_prng_impl", "rbg")
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    t0 = time.time()

    def note(msg):
        print(f"[bench_train {time.time()-t0:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    from speecht5_tpu.config import speecht5_base
    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.train.trainer import Trainer, TrainConfig

    cfg = speecht5_base(dtype="bfloat16")
    # host-CPU init + bulk transfer: the remote axon backend runs the init
    # program 5-13x slower than the host (see bench.py)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            model, variables = init_model(cfg, jax.random.PRNGKey(0))
            jax.block_until_ready(variables)
        variables = jax.device_put(variables, jax.devices()[0])
        jax.block_until_ready(variables)
    except RuntimeError:
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
    note("base model initialized")

    tcfg = TrainConfig(lr=1e-4, warmup_steps=100, ctc_weight=0.5)
    trainer = Trainer(model, variables, "s2t", tcfg)
    note("trainer built")

    rng = np.random.default_rng(0)
    T = B * [SECS * 16000]
    batch = {
        "wav": jnp.asarray(
            rng.standard_normal((B, T[0])), jnp.float32) * 0.1,
        "wav_lengths": jnp.asarray(T),
        "prev_tokens": jnp.asarray(
            rng.integers(4, cfg.vocab_size, (B, L_TGT)), jnp.int32),
        "targets": jnp.asarray(
            rng.integers(4, cfg.vocab_size, (B, L_TGT)), jnp.int32),
        "target_lengths": jnp.full((B,), L_TGT, jnp.int32),
    }

    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    m = trainer.train_step(batch, sub)
    loss0 = float(m["loss"])  # compile + warm, host fence
    note(f"train step compiled, loss={loss0:.4f}")

    t_start = time.perf_counter()
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        m = trainer.train_step(batch, sub)
    loss_last = float(m["loss"])  # fence: drains the pipelined steps
    dt = time.perf_counter() - t_start
    note(f"{STEPS} steps in {dt:.2f}s, final loss={loss_last:.4f}")

    assert np.isfinite(loss_last)
    steps_per_s = STEPS / dt
    from speecht5_tpu.utils import flops as F

    step_flops = F.s2t_train_flops(cfg, B, SECS * 16000, L_TGT)
    train_mfu = F.mfu(step_flops * STEPS, dt)
    note(f"analytical {step_flops/1e12:.2f} TFLOP/step "
         f"-> {step_flops*steps_per_s/1e12:.1f} TFLOP/s, "
         f"MFU {train_mfu*100:.1f}% of bf16 peak")
    print(json.dumps({
        "metric": "speecht5_base_asr_finetune_train_step",
        "steps_per_s": round(steps_per_s, 3),
        "audio_s_per_s": round(steps_per_s * B * SECS, 1),
        "train_mfu": round(train_mfu, 4),
        "tflops_per_step": round(step_flops / 1e12, 2),
        "batch": B,
        "utt_secs": SECS,
        "loss_first": round(loss0, 4),
        "loss_last": round(loss_last, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
