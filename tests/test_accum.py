"""Gradient accumulation (fairseq --update-freq, reference trainer semantics:
microbatch grads averaged into ONE optimizer update)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speecht5_tpu.config import speecht5_tiny
from speecht5_tpu.models.speecht5 import init_model
from speecht5_tpu.parallel.sharding import make_mesh
from speecht5_tpu.train.trainer import (
    Trainer, TrainConfig, TrainState, _loss_for_task, make_optimizer,
    make_train_step,
)


def _mesh2():
    # 2-way data parallel: checks the microbatch batch axis (axis 1) is the
    # one sharded for accumulation batches
    return make_mesh(2, 1, devices=jax.devices()[:2])


def _batch(rng, B, T=2000, L=6, vocab=40):
    return {
        "wav": jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.1,
        "wav_lengths": jnp.full((B,), T, jnp.int32),
        "prev_tokens": jnp.asarray(rng.integers(4, vocab, (B, L)), jnp.int32),
        "targets": jnp.asarray(rng.integers(4, vocab, (B, L)), jnp.int32),
        "target_lengths": jnp.full((B,), L, jnp.int32),
    }


class TestGradAccum:
    def test_accum_matches_manual_average(self):
        """The scanned accumulation step must equal a hand-rolled loop that
        replicates its rng folding: mean of microbatch grads, same loss and
        grad norm.  (Full-batch equivalence can't be exact: forward_s2t draws
        stochastic feature masks per forward.  Comparing post-adam params is
        ill-conditioned — near-zero-grad leaves like k_proj/bias turn float
        noise into sign flips — so grads are compared directly.)"""
        jax.config.update("jax_default_matmul_precision", "highest")
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        nprng = np.random.default_rng(0)
        full = _batch(nprng, 4, vocab=cfg.vocab_size)
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(2, 2, *x.shape[1:]), full
        )
        tcfg = TrainConfig(
            accum_steps=2, lr=1e-3, warmup_steps=1, ctc_weight=0.5,
            clip_norm=0.0,
        )
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        key = jax.random.PRNGKey(5)

        tx = make_optimizer(tcfg)
        step_fn = jax.jit(make_train_step(model, "s2t", tcfg))
        state = TrainState(
            params, tx.init(params), jnp.zeros((), jnp.int32), extra
        )
        _, m = step_fn(state, micro, key)

        # manual: same splits as the scan body (rng, sub = split(rng))
        loss_fn = _loss_for_task(model, "s2t", tcfg)
        step0 = jnp.zeros((), jnp.int32)
        grad_fn = jax.jit(jax.value_and_grad(
            lambda p, e, b, r: loss_fn(p, e, b, r, step0), has_aux=True
        ))
        gsum, losses, k = None, [], key
        for i in range(2):
            k, sub = jax.random.split(k)
            mb = jax.tree_util.tree_map(lambda x: x[i], micro)
            (loss, _), g = grad_fn(params, extra, mb, sub)
            losses.append(float(loss))
            gsum = g if gsum is None else jax.tree_util.tree_map(
                jnp.add, gsum, g)
        grads = jax.tree_util.tree_map(lambda x: x / 2.0, gsum)

        np.testing.assert_allclose(float(m["loss"]), np.mean(losses), rtol=1e-5)
        np.testing.assert_allclose(
            float(m["grad_norm"]), float(optax.global_norm(grads)), rtol=1e-5
        )

    def test_trainer_accum_on_data_mesh(self):
        """Trainer with accum_steps=2 on a 2-way data mesh computes the same
        loss/grad-norm as the unsharded step: the microbatch batch axis
        (axis 1), not the scan axis, must be the sharded one."""
        jax.config.update("jax_default_matmul_precision", "highest")
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        nprng = np.random.default_rng(0)
        full = _batch(nprng, 4, vocab=cfg.vocab_size)
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(2, 2, *x.shape[1:]), full
        )
        tcfg = TrainConfig(
            accum_steps=2, lr=1e-3, warmup_steps=1, ctc_weight=0.5,
            clip_norm=0.0,
        )
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        key = jax.random.PRNGKey(5)

        tx = make_optimizer(tcfg)
        step_fn = jax.jit(make_train_step(model, "s2t", tcfg))
        state = TrainState(
            params, tx.init(params), jnp.zeros((), jnp.int32), extra
        )
        _, m1 = step_fn(state, micro, key)

        tr = Trainer(model, variables, "s2t", tcfg, mesh=_mesh2())
        m2 = tr.train_step(micro, key)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
        )

    def test_accum_step_trains(self):
        """Repeated accum steps on a 2-way data mesh reduce the loss (the
        microbatch batch axis, not the scan axis, is sharded)."""
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        nprng = np.random.default_rng(1)
        full = _batch(nprng, 4, vocab=cfg.vocab_size)
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(2, 2, *x.shape[1:]), full
        )
        tr = Trainer(
            model, variables, "s2t",
            TrainConfig(accum_steps=2, lr=5e-3, warmup_steps=1),
            mesh=_mesh2(),
        )
        losses = [
            float(tr.train_step(micro, jax.random.PRNGKey(i))["loss"])
            for i in range(4)
        ]
        assert losses[-1] < losses[0]
