"""A/B: host-mel vs device-mel t2s training pipeline (one TPU chip).

Measures BOTH sides of the --device-mel trade (VERDICT r3 item 2):
  host path   : per-utterance numpy fbank in the collator (the reference's
                librosa-in-dataset design, text_to_speech_dataset.py:97-138)
                + [B, T, 80] f32 transfer, train step consumes target_mel;
  device path : collator only reflect-pads raw waveform ([B, Twav] f32
                transfer), the jitted train step runs the fused Pallas
                log-mel (ops/pallas_kernels.fused_log_mel) in-graph.

Prints ONE JSON line: collate ms, H2D bytes, steady train-step ms for both
paths at base-TTS geometry.  Run on the chip: python bench_mel_ab.py
"""

import json
import os
import sys
import time

import numpy as np

T0 = time.time()


def ph(name):
    print(f"[mel_ab {time.time()-T0:7.1f}s] {name}", file=sys.stderr, flush=True)


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.train.trainer import Trainer, TrainConfig
    from speecht5_tpu.data.manifests import collate_mel_targets

    ph(f"devices: {jax.devices()}")

    B = int(os.environ.get("MEL_AB_B", "16"))
    TOK = 64
    SECS = float(os.environ.get("MEL_AB_SECS", "9.8"))  # ~612 frames -> 768
    SR = 16000
    N = int(SECS * SR)

    arch = os.environ.get("MEL_AB_ARCH", "speecht5_base")
    import speecht5_tpu.config as C
    cfg = getattr(C, arch)(
        **({"dtype": "bfloat16"} if arch != "speecht5_tiny" else {}))
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            model, variables = init_model(cfg, jax.random.PRNGKey(0))
            jax.block_until_ready(variables)
        variables = jax.device_put(variables, jax.devices()[0])
        jax.block_until_ready(variables)
    except RuntimeError:
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
    ph("model ready")

    rng = np.random.default_rng(0)
    r = cfg.reduction_factor

    def make_items(seed):
        g = np.random.default_rng(seed)
        return [{"tgt_wav_raw": (0.1 * g.standard_normal(N)).astype(np.float32)}
                for _ in range(B)]

    # ---- collate cost (host CPU time per batch)
    out = {}
    for mode, device_mel in (("host", False), ("device", True)):
        items = make_items(1)
        if not device_mel:
            from speecht5_tpu.ops.mel import log_mel_numpy

            for it in items:
                it["mel"] = log_mel_numpy(it["tgt_wav_raw"],
                                          n_mels=cfg.n_mels)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            if not device_mel:
                for it in items:   # the recurring per-batch host fbank cost
                    it["mel"] = log_mel_numpy(it["tgt_wav_raw"],
                                              n_mels=cfg.n_mels)
            batch = collate_mel_targets(items, r, cfg.n_mels,
                                        bucketed=True, device_mel=device_mel)
            ts.append(time.perf_counter() - t0)
        out[f"{mode}_collate_ms"] = round(sorted(ts)[1] * 1e3, 1)
        out[f"{mode}_h2d_mb"] = round(sum(
            v.nbytes for v in batch.values()) / 1e6, 1)
        ph(f"{mode} collate {out[f'{mode}_collate_ms']}ms, "
           f"{out[f'{mode}_h2d_mb']}MB/batch")

    # ---- train-step cost
    tcfg = TrainConfig(lr=1e-4, warmup_steps=100)
    for mode, device_mel in (("host", False), ("device", True)):
        trainer = Trainer(model, variables, "t2s", tcfg)
        items = make_items(2)
        if not device_mel:
            from speecht5_tpu.ops.mel import log_mel_numpy

            for it in items:
                it["mel"] = log_mel_numpy(it["tgt_wav_raw"],
                                          n_mels=cfg.n_mels)
        mel_part = collate_mel_targets(items, r, cfg.n_mels, True, device_mel)
        batch = {
            "tokens": rng.integers(4, cfg.vocab_size, (B, TOK)).astype(np.int64),
            "spkembs": rng.standard_normal(
                (B, cfg.spk_embed_dim)).astype(np.float32),
            **mel_part,
        }
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        key = jax.random.PRNGKey(1)
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        loss0 = float(trainer.train_step(batch, sub)["loss"])
        ph(f"{mode} step compiled in {time.perf_counter()-t0:.1f}s, "
           f"loss={loss0:.3f}")
        STEPS = 10
        t0 = time.perf_counter()
        for _ in range(STEPS):
            key, sub = jax.random.split(key)
            m = trainer.train_step(batch, sub)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / STEPS
        out[f"{mode}_step_ms"] = round(dt * 1e3, 1)
        out[f"{mode}_loss0"] = round(loss0, 3)
        ph(f"{mode} steady {dt*1e3:.1f}ms/step")

    out["host_total_ms"] = round(
        out["host_collate_ms"] + out["host_step_ms"], 1)
    out["device_total_ms"] = round(
        out["device_collate_ms"] + out["device_step_ms"], 1)
    out["pipeline_speedup"] = round(
        out["host_total_ms"] / out["device_total_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
