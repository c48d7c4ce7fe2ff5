"""TTS / VC inference: jitted autoregressive mel decoding.

Behavioral spec from reference models/speecht5.py:1188-1249 (generate_speech):
- encode text (TTS) or source speech (VC); integrate the speaker x-vector;
- AR loop: decoder step -> feat_out gives r mel frames, sigmoid(prob_out) gives
  r stop probabilities; stop when any >= threshold or maxlen reached;
- conv postnet residual applied once over the whole mel at the end.

The reference loop reruns the Tacotron prenet over the entire history every
step — O(T^2) and Python-driven (batch=1).  Here the loop is a lax.while_loop
with a fixed-size output buffer and KV cache: O(T), batched, fully on device.
The always-on prenet dropout uses a threaded PRNG key (espnet convention keeps
dropout active at inference; reproducible here under a fixed seed).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class TTSResult(NamedTuple):
    mel: jnp.ndarray          # [B, L, n_mels] postnet-refined
    mel_before: jnp.ndarray   # [B, L, n_mels]
    lengths: jnp.ndarray      # [B] frames actually generated
    stop_probs: jnp.ndarray   # [B, L]
    wav: Optional[jnp.ndarray] = None          # [B, L*hop] when a vocoder is set
    wav_lengths: Optional[jnp.ndarray] = None  # [B] samples
    focus_rate: Optional[jnp.ndarray] = None   # [B] attention diagnostic


class TTSDecoder:
    def __init__(
        self,
        model,
        variables,
        *,
        max_len_ratio: float = 10.0,   # 20.0 for text input (reference :1197-1201)
        min_len_ratio: float = 0.0,
        threshold: float = 0.5,
        max_frames: int = 1600,        # static output buffer (r-steps bound)
        vocoder=None,                  # HiFiGANGenerator: mel -> waveform on-TPU
        vocoder_variables=None,
    ):
        self.model = model
        self.variables = variables
        self.cfg = model.cfg
        self.threshold = threshold
        self.max_len_ratio = max_len_ratio
        self.min_len_ratio = min_len_ratio
        self.max_steps = max_frames // self.cfg.reduction_factor
        self.vocoder = vocoder
        self.vocoder_variables = vocoder_variables
        # variables are jit ARGUMENTS (closed-over params would be inlined as
        # HLO constants — fatal for remote-compile backends on big models)
        self._decode_text = jax.jit(lambda v, vv, tokens, spk, rng: self._run(
            v, vv, self.model.apply(v, tokens, method="encode_text"), spk, rng,
        ))
        self._decode_speech = jax.jit(
            lambda v, vv, wav, lengths, spk, rng: self._run(
                v, vv, self.model.apply(v, wav, lengths, method="encode_speech"),
                spk, rng,
            )
        )

    def text_to_speech(self, tokens, spkembs=None, rng=None) -> TTSResult:
        rng = jax.random.PRNGKey(0) if rng is None else rng
        return self._decode_text(
            self.variables, self.vocoder_variables, tokens, spkembs, rng
        )

    def speech_to_speech(self, wav, wav_lengths, spkembs=None, rng=None) -> TTSResult:
        rng = jax.random.PRNGKey(0) if rng is None else rng
        return self._decode_speech(
            self.variables, self.vocoder_variables, wav, wav_lengths, spkembs, rng
        )

    # ------------------------------------------------------------------ loop

    def _run(self, variables, vocoder_variables, enc, spkembs, rng):
        cfg = self.cfg
        r = cfg.reduction_factor
        B = enc["encoder_out"].shape[0]
        n_mels = cfg.n_mels
        S = self.max_steps

        enc_len = enc["valid_mask"].astype(jnp.int32).sum(-1)
        max_steps_b = jnp.minimum(
            (enc_len.astype(jnp.float32) * self.max_len_ratio / r).astype(jnp.int32),
            S,
        )
        min_steps_b = (
            enc_len.astype(jnp.float32) * self.min_len_ratio / r
        ).astype(jnp.int32)

        # init_speech_cache applies model-level spk-emb integration
        # ('add'/'concat') to the encoder output before the cross-KV
        # precompute (reference speecht5.py:1203-1207)
        cache = self.model.apply(
            variables, enc, B, S + 1, spkembs=spkembs,
            method="init_speech_cache"
        )

        mel_buf = jnp.zeros((B, S * r, n_mels), jnp.float32)
        prob_buf = jnp.zeros((B, S * r), jnp.float32)
        prev = jnp.zeros((B, 1, n_mels), jnp.float32)  # zero-frame BOS
        done = jnp.zeros((B,), bool)
        lengths = jnp.zeros((B,), jnp.int32)

        def cond(carry):
            step, done = carry[0], carry[5]
            return jnp.logical_and(step < S, ~jnp.all(done))

        # focus-rate accumulator: per-(layer, head) running sum over steps of
        # max-over-source attention (reference generate_speech.py:54-66;
        # focus_rate = max over layers*heads of the per-step mean)
        L_dec = self.cfg.decoder.num_layers
        H_dec = self.cfg.decoder.num_heads
        focus_acc = jnp.zeros((L_dec, B, H_dec), jnp.float32)

        def body(carry):
            (step, prev, cache, mel_buf, prob_buf, done, lengths, rng,
             focus_acc) = carry
            rng, sub = jax.random.split(rng)
            frames, probs, cache, attn = self.model.apply(
                variables, prev, cache,
                spkembs=spkembs, enc_valid=enc["valid_mask"],
                method="speech_decode_step", need_attn=True,
                rngs={"prenet": sub},
            )
            step_max = attn.max(axis=-1).astype(jnp.float32)  # [L, B, H]
            focus_acc = focus_acc + step_max * (~done).astype(jnp.float32)[
                None, :, None
            ]
            # frames: [B, r, n_mels]; write into buffer at step*r
            mel_buf = jax.lax.dynamic_update_slice(
                mel_buf, frames.astype(jnp.float32), (0, step * r, 0)
            )
            prob_buf = jax.lax.dynamic_update_slice(
                prob_buf, probs.astype(jnp.float32), (0, step * r)
            )
            hit_stop = jnp.any(probs >= self.threshold, axis=-1)
            can_stop = step + 1 >= min_steps_b
            hit_max = step + 1 >= max_steps_b
            newly_done = (~done) & ((hit_stop & can_stop) | hit_max)
            lengths = jnp.where(newly_done, (step + 1) * r, lengths)
            done = done | newly_done
            prev = frames[:, -1:, :]
            return (step + 1, prev, cache, mel_buf, prob_buf, done, lengths,
                    rng, focus_acc)

        carry = (jnp.zeros((), jnp.int32), prev, cache, mel_buf, prob_buf,
                 done, lengths, rng, focus_acc)
        (step, _, _, mel_buf, prob_buf, done, lengths, _,
         focus_acc) = jax.lax.while_loop(cond, body, carry)
        lengths = jnp.where(done, lengths, step * r)
        steps_b = jnp.maximum(lengths // r, 1).astype(jnp.float32)
        focus_rate = (focus_acc / steps_b[None, :, None]).max(axis=(0, 2))

        mel_after = self.model.apply(
            variables, mel_buf, method="postnet_refine"
        )
        wav = wav_lengths = None
        if self.vocoder is not None and vocoder_variables is not None:
            # mel -> waveform inside the same device program (the reference
            # defers to an external torch HiFi-GAN, README.md:250)
            wav = self.vocoder.apply(vocoder_variables, mel_after)
            hop = wav.shape[-1] // mel_after.shape[1]
            wav_lengths = lengths * hop
        return TTSResult(
            mel=mel_after, mel_before=mel_buf, lengths=lengths,
            stop_probs=prob_buf, wav=wav, wav_lengths=wav_lengths,
            focus_rate=focus_rate,
        )
