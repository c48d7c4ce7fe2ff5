"""Activation checkpointing (remat) tests: numerics unchanged, grads intact.

The reference optionally wraps decoder layers in fairseq's checkpoint_wrapper
(reference modules/decoder.py:88-91); here remat is a TransformerConfig flag
lifted through nn.remat so checkpoint param names are unchanged."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from speecht5_tpu.config import speecht5_tiny, replace
from speecht5_tpu.models.speecht5 import init_model
from speecht5_tpu.train.trainer import Trainer, TrainConfig


def _remat_cfg(cfg):
    return replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, remat=True),
        decoder=dataclasses.replace(cfg.decoder, remat=True),
    )


class TestRemat:
    def test_same_params_same_forward(self):
        """remat=True must produce identical params and forward outputs."""
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        rcfg = _remat_cfg(cfg)
        rmodel, rvariables = init_model(rcfg, jax.random.PRNGKey(0))
        # identical param trees (names preserved through nn.remat)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b)
            ),
            variables["params"], rvariables["params"],
        )
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 2500])
        prev = jnp.full((2, 5), cfg.eos_id, jnp.int32)
        out = model.apply(variables, wav, lengths, prev, mask=False,
                          deterministic=True, method="forward_s2t")
        rout = rmodel.apply(rvariables, wav, lengths, prev, mask=False,
                            deterministic=True, method="forward_s2t")
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(rout[0]), atol=1e-5
        )

    def test_train_step_matches_no_remat(self):
        """One jitted train step gives the same loss and grad norm with and
        without activation checkpointing."""
        cfg = speecht5_tiny()
        rng = np.random.default_rng(0)
        batch = {
            "wav": jnp.asarray(rng.standard_normal((8, 3200)), jnp.float32) * 0.1,
            "wav_lengths": jnp.full((8,), 3200, jnp.int32),
            "prev_tokens": jnp.full((8, 6), cfg.eos_id, jnp.int32),
            "targets": jnp.full((8, 6), 5, jnp.int32),
        }
        tcfg = TrainConfig(ctc_weight=0.3)
        losses = {}
        for name, c in (("plain", cfg), ("remat", _remat_cfg(cfg))):
            model, variables = init_model(c, jax.random.PRNGKey(0))
            trainer = Trainer(model, variables, "s2t", tcfg)
            metrics = trainer.train_step(batch, jax.random.PRNGKey(7))
            losses[name] = (
                float(metrics["loss"]), float(metrics["grad_norm"])
            )
        np.testing.assert_allclose(
            losses["plain"][0], losses["remat"][0], rtol=1e-5
        )
        np.testing.assert_allclose(
            losses["plain"][1], losses["remat"][1], rtol=1e-4
        )
