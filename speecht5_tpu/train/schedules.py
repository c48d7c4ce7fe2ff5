"""Learning-rate schedules matching the fairseq recipes the reference trains
with (SpeechT5/README.md recipes): warmup + inverse-sqrt decay, tri-stage, and
polynomial decay.  Thin optax-compatible callables."""

from __future__ import annotations

import jax.numpy as jnp


def inverse_sqrt(peak_lr: float, warmup_steps: int):
    """fairseq inverse_sqrt: linear warmup then lr * sqrt(warmup/step)."""

    def fn(step):
        step = jnp.maximum(step, 1)
        warm = peak_lr * step / warmup_steps
        decay = peak_lr * jnp.sqrt(warmup_steps / step)
        return jnp.where(step < warmup_steps, warm, decay)

    return fn


def tri_stage(peak_lr: float, warmup_steps: int, hold_steps: int,
              decay_steps: int, init_scale: float = 0.01,
              final_scale: float = 0.05):
    """fairseq tri_stage: warmup -> hold -> exponential decay to final_scale."""

    import math

    decay_factor = -math.log(final_scale) / max(decay_steps, 1)

    def fn(step):
        s = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        warm = peak_lr * (
            init_scale + (1 - init_scale) * jnp.minimum(s / warmup_steps, 1.0)
        )
        in_decay = jnp.clip(s - warmup_steps - hold_steps, 0, decay_steps)
        decay = peak_lr * jnp.exp(-decay_factor * in_decay)
        return jnp.where(
            s < warmup_steps, warm,
            jnp.where(s < warmup_steps + hold_steps, peak_lr, decay),
        )

    return fn


def polynomial_decay(peak_lr: float, warmup_steps: int, total_steps: int,
                     end_lr: float = 0.0, power: float = 1.0):
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = peak_lr * s / jnp.maximum(warmup_steps, 1)
        frac = jnp.clip(
            (s - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0, 1
        )
        decay = (peak_lr - end_lr) * (1 - frac) ** power + end_lr
        return jnp.where(s < warmup_steps, warm, decay)

    return fn
