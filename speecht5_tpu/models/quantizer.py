"""Gumbel-softmax vector quantizer (wav2vec2-style).

Behavioral spec: fairseq GumbelVectorQuantizer as used by the reference for
codebook mixing of encoder outputs (reference models/speecht5.py:93-107,858-882):
grouped codebooks, straight-through Gumbel-softmax at train time, argmax at eval,
prob/code perplexity diagnostics for the diversity loss.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class GumbelVectorQuantizer(nn.Module):
    dim: int                 # input dim
    num_vars: int            # V entries per group
    groups: int              # G
    vq_dim: int              # output dim (split across groups)
    temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.vq_dim % self.groups == 0
        var_dim = self.vq_dim // self.groups
        self.vars = self.param(
            "vars",
            nn.initializers.uniform(scale=1.0),
            (1, self.num_vars * self.groups, var_dim),
            jnp.float32,
        )
        self.weight_proj = nn.Dense(
            self.groups * self.num_vars, dtype=jnp.float32,
            param_dtype=self.param_dtype, name="weight_proj",
        )

    def current_temp(self, num_updates):
        start, end, decay = self.temp
        return jnp.maximum(start * decay ** num_updates, end)

    def __call__(self, x, *, num_updates=0, produce_targets: bool = False,
                 deterministic: bool = True):
        """x: [B, T, dim] -> dict(x=[B, T, vq_dim], prob_perplexity, code_perplexity,
        num_vars, temp, targets?)."""
        B, T, _ = x.shape
        G, V = self.groups, self.num_vars

        logits = self.weight_proj(x.astype(jnp.float32)).reshape(B * T * G, V)

        # diagnostics
        probs_sm = jax.nn.softmax(logits, axis=-1).reshape(B * T, G, V)
        avg_probs = probs_sm.mean(axis=0)  # [G, V]
        prob_ppl = jnp.sum(
            jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1))
        )

        if deterministic:
            idx = jnp.argmax(logits, axis=-1)
            onehot = jax.nn.one_hot(idx, V, dtype=jnp.float32)
        else:
            tau = self.current_temp(num_updates)
            g = -jnp.log(
                -jnp.log(
                    jax.random.uniform(
                        self.make_rng("gumbel"), logits.shape, minval=1e-9, maxval=1.0
                    )
                )
            )
            y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, V, dtype=jnp.float32)
            onehot = y_hard + y_soft - jax.lax.stop_gradient(y_soft)  # straight-through

        hard_probs = jax.nn.one_hot(idx, V, dtype=jnp.float32).reshape(B * T, G, V).mean(0)
        code_ppl = jnp.sum(
            jnp.exp(-jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1))
        )

        # select codewords: onehot [B*T*G, V] x vars per group
        vars_ = self.vars.reshape(G, V, -1)  # [G, V, var_dim]
        sel = jnp.einsum(
            "ngv,gvd->ngd", onehot.reshape(B * T, G, V), vars_
        )  # [B*T, G, var_dim]
        out = sel.reshape(B, T, self.vq_dim).astype(self.dtype)

        result = {
            "x": out,
            "prob_perplexity": prob_ppl,
            "code_perplexity": code_ppl,
            "num_vars": float(G * V),
        }
        if produce_targets:
            result["targets"] = idx.reshape(B, T, G)
        return result
