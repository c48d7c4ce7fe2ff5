"""VATLM tests: tri-modal fusion, modality subsets, masked-prediction
pretraining, modality dropout, and the seq2seq ASR fine-tune surface.

Behavioral spec: reference VATLM/vat_hubert/vathubert/models/vathubert.py:
338-850 (model), models/resnet.py (video frontend),
vathubert/criterions/vathubert_criterion.py:45 (HuBERT-style loss)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht5_tpu.models.vatlm import VATLMModel, vatlm_tiny
from speecht5_tpu.train.criterions import hubert_loss

B, T = 2, 12


@pytest.fixture(scope="module")
def vatlm():
    cfg = vatlm_tiny()
    model = VATLMModel(cfg)
    audio = jnp.zeros((B, T, cfg.audio_feat_dim))
    video = jnp.zeros((B, T, cfg.video_size, cfg.video_size, 1))
    lengths = jnp.asarray([T, T])
    phones = jnp.full((B, 8), 5, jnp.int32)
    prev = jnp.full((B, 5), cfg.eos_id, jnp.int32)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
             "modality": jax.random.PRNGKey(2)},
            audio, video, lengths, phones, prev, method="init_all",
        )
    )()
    return cfg, model, variables


def _rngs(i=0):
    return {"mask": jax.random.PRNGKey(10 + i),
            "modality": jax.random.PRNGKey(20 + i)}


class TestTriModalPretrain:
    def test_av_plus_phone_forward(self, vatlm, rng):
        cfg, m, v = vatlm
        audio = jnp.asarray(
            rng.standard_normal((B, T, cfg.audio_feat_dim)), jnp.float32
        )
        video = jnp.asarray(
            rng.standard_normal((B, T, cfg.video_size, cfg.video_size, 1)),
            jnp.float32,
        )
        phones = jnp.full((B, 20), 7, jnp.int32)  # longer than T: truncated
        out, _ = m.apply(
            v, audio, video, jnp.asarray([T, T - 4]), phone_tokens=phones,
            mask=True, deterministic=False, rngs=_rngs(),
            mutable=["batch_stats"], method="forward_pretrain",
        )
        assert len(out["logits"]) == len(cfg.num_classes)
        assert out["logits"][0].shape == (B, T, cfg.num_classes[0])
        assert out["time_mask"].shape == (B, T)
        assert np.isfinite(np.asarray(out["logits"][0])).all()

    def test_audio_only_and_video_only(self, vatlm, rng):
        cfg, m, v = vatlm
        audio = jnp.asarray(
            rng.standard_normal((B, T, cfg.audio_feat_dim)), jnp.float32
        )
        out_a = m.apply(
            v, audio, None, jnp.asarray([T, T]), mask=False,
            deterministic=True, method="forward_pretrain",
        )
        video = jnp.asarray(
            rng.standard_normal((B, T, cfg.video_size, cfg.video_size, 1)),
            jnp.float32,
        )
        out_v = m.apply(
            v, None, video, jnp.asarray([T, T]), mask=False,
            deterministic=True, method="forward_pretrain",
        )
        assert out_a["logits"][0].shape == out_v["logits"][0].shape
        assert not np.allclose(
            np.asarray(out_a["logits"][0]), np.asarray(out_v["logits"][0])
        )

    def test_text_only_forward(self, vatlm):
        cfg, m, v = vatlm
        phones = jnp.full((1, 9), 11, jnp.int32)
        out = m.apply(
            v, None, None, None, phone_tokens=phones, mask=False,
            deterministic=True, method="forward_pretrain",
        )
        assert out["logits"][0].shape == (1, 9, cfg.num_classes[0])

    def test_modality_dropout_zeroes_one_branch(self, rng):
        """With modality_dropout=1 and audio_dropout=1, the audio branch is
        zeroed: output equals the video+phone-only forward."""
        import dataclasses

        cfg = vatlm_tiny(modality_dropout=1.0, audio_dropout=1.0)
        m = VATLMModel(cfg)
        audio = jnp.asarray(
            rng.standard_normal((1, T, cfg.audio_feat_dim)), jnp.float32
        )
        video = jnp.asarray(
            rng.standard_normal((1, T, cfg.video_size, cfg.video_size, 1)),
            jnp.float32,
        )
        variables = m.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
             "modality": jax.random.PRNGKey(2)},
            audio, video, jnp.asarray([T]), mask=False, deterministic=False,
            method="forward_pretrain",
        )
        params = {k: v for k, v in variables.items()}
        dropped, _ = m.apply(
            params, audio, video, jnp.asarray([T]), mask=False,
            deterministic=False, rngs=_rngs(1), mutable=["batch_stats"],
            method="forward_pretrain",
        )
        zero_audio, _ = m.apply(
            params, jnp.zeros_like(audio), video, jnp.asarray([T]),
            mask=False, deterministic=False, rngs=_rngs(1),
            mutable=["batch_stats"], method="forward_pretrain",
        )
        np.testing.assert_allclose(
            np.asarray(dropped["logits"][0]),
            np.asarray(zero_audio["logits"][0]), atol=1e-5,
        )

    def test_hubert_loss_over_pretrain_output(self, vatlm, rng):
        cfg, m, v = vatlm
        audio = jnp.asarray(
            rng.standard_normal((B, T, cfg.audio_feat_dim)), jnp.float32
        )
        out, _ = m.apply(
            v, audio, None, jnp.asarray([T, T]), mask=True,
            deterministic=False, rngs=_rngs(2), mutable=["batch_stats"],
            method="forward_pretrain",
        )
        targets = jnp.asarray(
            rng.integers(0, cfg.num_classes[0], (B, T)), jnp.int32
        )
        loss, metrics = hubert_loss(
            out["logits"], [targets], out["time_mask"], out["valid_mask"]
        )
        assert np.isfinite(float(loss))
        assert "loss_m_0" in metrics


class TestVATLMASR:
    def test_forward_asr_and_step_decode(self, vatlm, rng):
        cfg, m, v = vatlm
        audio = jnp.asarray(
            rng.standard_normal((1, T, cfg.audio_feat_dim)), jnp.float32
        )
        video = jnp.asarray(
            rng.standard_normal((1, T, cfg.video_size, cfg.video_size, 1)),
            jnp.float32,
        )
        prev = jnp.asarray([[cfg.eos_id, 5, 9, 11]])
        logits, enc_valid = m.apply(
            v, audio, video, jnp.asarray([T]), prev, deterministic=True,
            method="forward_asr",
        )
        assert logits.shape == (1, 4, cfg.vocab_size)

        # KV-cached step decode reproduces teacher forcing
        enc = m.apply(v, audio, video, jnp.asarray([T]), deterministic=True,
                      method="encode_av")
        full = np.asarray(
            m.apply(v, enc, prev, deterministic=True, method="decode_text")
        )
        cache = m.apply(v, enc, 1, prev.shape[1] + 1, method="init_text_cache")
        steps = []
        for t in range(prev.shape[1]):
            lg, cache = m.apply(
                v, prev[:, t : t + 1], cache, enc_valid=enc["valid_mask"],
                method="text_decode_step",
            )
            steps.append(np.asarray(lg))
        np.testing.assert_allclose(np.stack(steps, axis=1), full, atol=2e-3)
