"""Train-step fori_loop timing with MINIMAL live HBM.

Hypothesis: earlier fori_loop train-step runs were 24-100x slow because
extra live buffers (a second copy of the optimizer state) pushed the
program into XLA's memory-saving schedule.  Here: exactly one state,
donated through the loop program; everything else freed.
"""
import sys
import time

import numpy as np

T0 = time.time()


def note(msg):
    print(f"[proto {time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_default_prng_impl", "rbg")
    note(f"devices: {jax.devices()}")

    from speecht5_tpu.config import speecht5_base
    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.train.trainer import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
    )

    cfg = speecht5_base(dtype="bfloat16")
    B, T, L = 16, 160000, 60
    N = 8

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        jax.block_until_ready(variables)
    variables = jax.device_put(variables, jax.devices()[0])
    jax.block_until_ready(variables)
    note("init done")

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.1
    prev = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, L)), jnp.int32)
    batch = {
        "wav": wav, "wav_lengths": jnp.full((B,), T, jnp.int32),
        "prev_tokens": prev, "targets": prev,
        "target_lengths": jnp.full((B,), L, jnp.int32),
    }
    tcfg = TrainConfig(lr=1e-4, warmup_steps=100, ctc_weight=0.5)
    tx = make_optimizer(tcfg)
    step_fn = make_train_step(model, "s2t", tcfg)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), extra)
    jax.block_until_ready(state)
    del variables, params, extra  # state holds the only reference now
    note("state built; only one copy live")

    from functools import partial

    @partial(jax.jit, donate_argnums=0)
    def loop(state, key):
        def body(i, st):
            st, _ = step_fn(st, batch, jax.random.fold_in(key, i))
            return st
        return jax.lax.fori_loop(0, N, body, state)

    state = loop(state, jax.random.PRNGKey(2))
    float(state.step)
    note("warm done")
    t0 = time.perf_counter()
    state = loop(state, jax.random.PRNGKey(3))
    float(state.step)
    dt = (time.perf_counter() - t0) / N
    note(f"fori_loop donated, minimal memory: {dt*1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
