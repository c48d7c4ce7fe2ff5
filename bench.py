"""Benchmark: SpeechT5-Base ASR decode throughput on one TPU chip.

Measures the full inference path — waveform -> conv prenet -> 12-layer encoder
(+CTC head) -> jitted joint CTC/attention beam search (beam 5) with KV cache —
as multiples of realtime audio per chip.  BASELINE.json north star: >= 50x
realtime at parity WER (the reference publishes no speed numbers and its joint
CTC decode is batch=1 with per-step CPU hops; here the whole batch decodes in
one device program).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from speecht5_tpu.config import speecht5_base_asr
    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.decode.asr import ASRDecoder

    BATCH = 8
    AUDIO_SECONDS = 10.0
    SR = 16000
    T = int(AUDIO_SECONDS * SR)
    BEAM = 5
    MAX_LEN = 40
    MIN_LEN = 30   # random weights would stop instantly; force a realistic
                   # hypothesis length (~3 tokens/sec speech) for honest timing

    cfg = speecht5_base_asr(dtype="bfloat16", vocab_size=896)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    decoder = ASRDecoder(
        model, variables, beam_size=BEAM, max_len=MAX_LEN,
        ctc_weight=0.3, min_len=MIN_LEN,
    )

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, T)), jnp.float32) * 0.05
    lengths = jnp.full((BATCH,), T, jnp.int32)

    # compile
    res = decoder(wav, lengths)
    jax.block_until_ready(res.tokens)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        res = decoder(wav, lengths)
        jax.block_until_ready(res.tokens)
    dt = (time.perf_counter() - t0) / iters

    realtime_x = BATCH * AUDIO_SECONDS / dt
    print(json.dumps({
        "metric": "speecht5_base_asr_beam5_ctc_decode_throughput",
        "value": round(realtime_x, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(realtime_x / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
