"""Joint multi-forward pretraining steps: SpeechUT (reference
speechut_criterion.py:166-265: one update = speech HuBERT + paired U2T
CE/CTC + mono MUM, text losses rescaled by speech/text sample sizes) and
SpeechLM (speechlm_criterion.py:66-200: dual-level HuBERT + text MUM/CTC)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from speecht5_tpu.models.speechut import SpeechUTModel, speechut_tiny
from speecht5_tpu.models.speechlm import SpeechLMModel, speechlm_tiny
from speecht5_tpu.train.joint import (
    JointLossConfig, make_speechut_joint_loss, make_speechlm_joint_loss,
)

RNGS = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}


@pytest.fixture(scope="module")
def setup():
    cfg = speechut_tiny()
    model = SpeechUTModel(cfg)
    wav = jnp.zeros((2, 4000))
    lengths = jnp.asarray([4000, 4000])
    frames = cfg.conv_features.out_length(4000)
    units = jnp.zeros((2, frames), jnp.int32)
    prev = jnp.full((2, 5), cfg.eos_id, jnp.int32)
    variables = jax.jit(
        lambda: model.init(RNGS, wav, lengths, units, prev, method="init_all")
    )()
    rng = np.random.default_rng(0)
    frames = cfg.conv_features.out_length(4000)
    batch = {
        "speech": {
            "wav": jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1,
            "wav_lengths": jnp.asarray([4000, 3000]),
            "units": jnp.asarray(
                rng.integers(2, cfg.unit_vocab_size, (2, frames)), jnp.int32
            ),
        },
        "text_paired": {
            "units": jnp.asarray(
                rng.integers(2, cfg.unit_vocab_size, (2, 10)), jnp.int32
            ),
            "prev_tokens": jnp.full((2, 6), cfg.eos_id, jnp.int32),
            "targets": jnp.asarray(
                rng.integers(5, cfg.text_vocab_size, (2, 6)), jnp.int32
            ),
        },
        "text_mono": {
            "units": jnp.asarray(
                rng.integers(2, cfg.unit_vocab_size, (2, 12)), jnp.int32
            ),
        },
    }
    return cfg, model, variables, batch


class TestJointLoss:
    def test_all_branches_contribute(self, setup):
        cfg, model, variables, batch = setup
        jcfg = JointLossConfig(
            u2t_ed_weight=0.1, u2t_ctc_weight=0.1, text_mum_weight=0.5
        )
        loss_fn = jax.jit(make_speechut_joint_loss(model, jcfg))
        loss, metrics = loss_fn(
            variables["params"], batch, jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(loss))
        for k in ("speech_loss_m_0", "text_dec_loss", "text_ctc_loss",
                  "mum_loss_m_0"):
            assert k in metrics, sorted(metrics)
        # joint loss exceeds the speech-only loss (weights positive)
        speech_only, _ = jax.jit(make_speechut_joint_loss(
            model, JointLossConfig(
                u2t_ed_weight=0.0, u2t_ctc_weight=0.0, text_mum_weight=0.0
            )
        ))(variables["params"], batch, jax.random.PRNGKey(2))
        assert float(loss) > float(speech_only)

    def test_grads_reach_all_branches(self, setup):
        cfg, model, variables, batch = setup
        jcfg = JointLossConfig(
            u2t_ed_weight=0.1, u2t_ctc_weight=0.0, text_mum_weight=0.5
        )
        loss_fn = make_speechut_joint_loss(model, jcfg)
        (loss, metrics), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(variables["params"], batch, jax.random.PRNGKey(3))
        g = jax.tree_util.tree_map(
            lambda x: float(jnp.abs(x).sum()), grads
        )
        flat = {
            "/".join(str(getattr(k, "key", k)) for k in p): v
            for p, v in jax.tree_util.tree_flatten_with_path(g)[0]
        }
        # conv FE (speech), decoder (paired), unit embeddings (all branches)
        assert any("feature_extractor" in k and v > 0 for k, v in flat.items())
        assert any("decoder" in k and v > 0 for k, v in flat.items())
        assert any("unit_embed_tokens" in k and v > 0 for k, v in flat.items())

    def test_speechlm_joint_loss(self):
        cfg = speechlm_tiny()
        model = SpeechLMModel(cfg)
        rng = np.random.default_rng(1)
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 4000])
        frames = cfg.conv_features.out_length(4000)
        units = jnp.asarray(
            rng.integers(2, cfg.unit_vocab_size, (2, frames)), jnp.int32
        )
        rngs = {"params": jax.random.PRNGKey(0),
                "mask": jax.random.PRNGKey(1), "mix": jax.random.PRNGKey(2)}
        v = model.init(rngs, wav, lengths, units, mask=True,
                       method="forward_speech")
        v2 = SpeechLMModel(cfg).init(
            rngs, units[:, :12], mask=True, method="forward_text"
        )
        params = dict(v2["params"])
        params.update(v["params"])

        batch = {
            "speech": {
                "wav": jnp.asarray(
                    rng.standard_normal((2, 4000)), jnp.float32) * 0.1,
                "wav_lengths": lengths,
                "units": units,
            },
            "text": {
                "units": jnp.asarray(
                    rng.integers(2, cfg.unit_vocab_size, (2, 12)), jnp.int32
                ),
                "char_targets": jnp.asarray(
                    rng.integers(2, cfg.text_vocab_size, (2, 6)), jnp.int32
                ),
            },
        }
        jcfg = JointLossConfig(text_mum_weight=0.5, u2t_ctc_weight=0.1)
        loss_fn = jax.jit(make_speechlm_joint_loss(model, jcfg))
        loss, metrics = loss_fn(params, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(loss))
        for k in ("speech_loss_m_0", "speech_loss_m_1", "mum_loss_m_0",
                  "char_ctc_loss"):
            assert k in metrics, sorted(metrics)

    def test_optimizer_step_reduces_loss(self, setup):
        cfg, model, variables, batch = setup
        jcfg = JointLossConfig(u2t_ed_weight=0.1, text_mum_weight=0.5)
        loss_fn = make_speechut_joint_loss(model, jcfg)
        tx = optax.adam(5e-3)
        params = variables["params"]
        opt = tx.init(params)
        step = jax.jit(
            lambda p, o, r: (jax.value_and_grad(loss_fn, has_aux=True)(
                p, batch, r), o)
        )
        losses = []
        for i in range(5):
            ((loss, _), grads), _ = step(params, opt, jax.random.PRNGKey(9))
            updates, opt = tx.update(grads, opt)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
