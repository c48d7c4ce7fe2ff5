"""Model-level tests: shapes, jit, KV-cache parity (incremental == full)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht5_tpu.config import speecht5_tiny
from speecht5_tpu.models.speecht5 import SpeechT5Model, init_model


@pytest.fixture(scope="module")
def tiny():
    cfg = speecht5_tiny()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


class TestEncoder:
    def test_encode_speech_shapes(self, tiny):
        cfg, model, variables = tiny
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 2000])
        enc = model.apply(variables, wav, lengths, with_ctc=True,
                          method="encode_speech")
        frames = cfg.conv_features.out_length(4000)
        assert enc["encoder_out"].shape == (2, frames, cfg.d_model)
        assert enc["valid_mask"].shape == (2, frames)
        assert enc["ctc_logits"].shape == (2, frames, cfg.vocab_size)
        v = np.asarray(enc["valid_mask"])
        assert v[0].sum() > v[1].sum()

    def test_encode_text_shapes(self, tiny):
        cfg, model, variables = tiny
        tokens = jnp.asarray([[5, 6, 7, 1, 1], [8, 9, 10, 11, 2]])
        enc = model.apply(variables, tokens, method="encode_text")
        assert enc["encoder_out"].shape == (2, 5, cfg.d_model)
        np.testing.assert_array_equal(
            np.asarray(enc["valid_mask"]),
            [[True, True, True, False, False], [True, True, True, True, True]],
        )

    def test_attention_padding_invariance(self, tiny):
        """Padded key positions must not influence valid encoder outputs.

        Tested at the transformer-stack level (the conv frontend's GroupNorm
        normalizes each channel over the padded time axis, so frame-exact
        invariance through the full prenet holds only for zero padding — the
        reference wav2vec2 extractor shares this property)."""
        cfg, model, variables = tiny
        from speecht5_tpu.models.encoder import TransformerEncoder

        enc_mod = TransformerEncoder(cfg.encoder, ctc_vocab_size=cfg.vocab_size)
        rngk = jax.random.PRNGKey(0)
        x = jax.random.normal(rngk, (1, 12, cfg.d_model))
        ev = enc_mod.init({"params": rngk}, x)
        valid = jnp.arange(12)[None, :] < 8
        out_masked = enc_mod.apply(ev, x, valid)["encoder_out"]
        out_trunc = enc_mod.apply(ev, x[:, :8], jnp.ones((1, 8), bool))["encoder_out"]
        np.testing.assert_allclose(
            np.asarray(out_masked)[0, :8], np.asarray(out_trunc)[0],
            atol=1e-4, rtol=1e-3,
        )

    def test_hubert_logits(self, tiny):
        cfg, model, variables = tiny
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 4000])
        enc = model.apply(variables, wav, lengths, method="encode_speech")
        logits = model.apply(variables, enc, method="hubert_logits")
        frames = cfg.conv_features.out_length(4000)
        assert len(logits) == len(cfg.hubert.num_classes)
        assert logits[0].shape == (2, frames, cfg.hubert.num_classes[0])


class TestDecoderParity:
    def test_text_incremental_matches_full(self, tiny):
        cfg, model, variables = tiny
        rngk = jax.random.PRNGKey(1)
        wav = jax.random.normal(rngk, (2, 4000)) * 0.1
        lengths = jnp.asarray([4000, 4000])
        enc = model.apply(variables, wav, lengths, method="encode_speech")

        tokens = jnp.asarray([[2, 5, 6, 7, 8], [2, 9, 10, 11, 12]])
        full_logits = model.apply(variables, enc, tokens, method="decode_text")

        cache = model.apply(variables, enc, 2, 8, method="init_text_cache")
        step_logits = []
        for t in range(tokens.shape[1]):
            lg, cache = model.apply(
                variables, tokens[:, t : t + 1], cache,
                enc_valid=enc["valid_mask"], method="text_decode_step",
            )
            step_logits.append(np.asarray(lg))
        step_logits = np.stack(step_logits, axis=1)
        np.testing.assert_allclose(
            np.asarray(full_logits), step_logits, atol=2e-4, rtol=1e-3
        )

    def test_speech_incremental_matches_full(self, tiny):
        cfg, model, variables = tiny
        rngk = jax.random.PRNGKey(2)
        wav = jax.random.normal(rngk, (1, 4000)) * 0.1
        lengths = jnp.asarray([4000])
        enc = model.apply(variables, wav, lengths, method="encode_speech")

        Tr = 4
        prev_mel = jax.random.normal(rngk, (1, Tr, cfg.n_mels))
        spk = jax.random.normal(rngk, (1, cfg.spk_embed_dim))

        before, after, stop_logits, _ = model.apply(
            variables, enc, prev_mel, jnp.asarray([Tr]), spk, method="decode_speech"
        )
        assert before.shape == (1, Tr * cfg.reduction_factor, cfg.n_mels)
        assert after.shape == before.shape
        assert stop_logits.shape == (1, Tr * cfg.reduction_factor)

        cache = model.apply(variables, enc, 1, 8, method="init_speech_cache")
        frames_all = []
        for t in range(Tr):
            frames, probs, cache, _ = model.apply(
                variables, prev_mel[:, t : t + 1], cache, spkembs=spk,
                enc_valid=enc["valid_mask"], method="speech_decode_step",
            )
            frames_all.append(np.asarray(frames))
        step_before = np.concatenate(frames_all, axis=1)
        np.testing.assert_allclose(
            np.asarray(before), step_before, atol=2e-4, rtol=1e-3
        )

    def test_jit_decode_step(self, tiny):
        cfg, model, variables = tiny
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 4000])
        enc = model.apply(variables, wav, lengths, method="encode_speech")
        tokens = jnp.asarray([[2], [2]])
        cache = model.apply(variables, enc, 2, 8, method="init_text_cache")

        @jax.jit
        def step(tok, cache, valid):
            return model.apply(
                variables, tok, cache, enc_valid=valid, method="text_decode_step"
            )

        lg1, cache = step(tokens, cache, enc["valid_mask"])
        lg2, cache = step(tokens, cache, enc["valid_mask"])
        assert lg1.shape == (2, cfg.vocab_size)
        assert int(cache["index"]) == 2


class TestTrainingForwards:
    def test_forward_s2t(self, tiny):
        cfg, model, variables = tiny
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 4000])
        prev = jnp.asarray([[2, 5, 6], [2, 7, 8]])
        logits, ctc_logits, enc_valid = model.apply(
            variables, wav, lengths, prev, mask=True, deterministic=False,
            rngs={"mask": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
                  "layerdrop": jax.random.PRNGKey(2)},
            method="forward_s2t",
        )
        assert logits.shape == (2, 3, cfg.vocab_size)
        assert ctc_logits.shape[-1] == cfg.vocab_size

    def test_forward_pretrain_speech(self, tiny):
        cfg, model, variables = tiny
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 4000])
        prev_mel = jnp.zeros((2, 3, cfg.n_mels))
        tgt_lengths = jnp.asarray([3, 2])
        spk = jnp.zeros((2, cfg.spk_embed_dim))
        out = model.apply(
            variables, wav, lengths, prev_mel, tgt_lengths, spk,
            deterministic=False,
            rngs={"mask": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
                  "layerdrop": jax.random.PRNGKey(2), "prenet": jax.random.PRNGKey(3),
                  "codebook": jax.random.PRNGKey(4), "gumbel": jax.random.PRNGKey(5)},
            mutable=["batch_stats"],
            method="forward_pretrain_speech",
        )[0]
        assert out["time_mask"] is not None
        assert out["before"].shape == (2, 3 * cfg.reduction_factor, cfg.n_mels)
        assert len(out["hubert_logits"]) == 1


class TestSpkEmbedIntegration:
    """spk_embed_integration 'add'/'concat' act on the ENCODER output
    (reference speecht5.py:895-908, _integrate_with_spk_embed :1001-1020);
    'pre' acts inside the speech decoder prenet."""

    @pytest.mark.parametrize("mode", ["pre", "add", "concat"])
    def test_mode_changes_output(self, mode):
        from speecht5_tpu.config import speecht5_tiny
        from dataclasses import replace

        cfg = replace(speecht5_tiny(), spk_embed_integration=mode)
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        rngk = jax.random.PRNGKey(3)
        wav = jax.random.normal(rngk, (2, 4000)) * 0.1
        lengths = jnp.asarray([4000, 4000])
        enc = model.apply(variables, wav, lengths, method="encode_speech")
        Tr = 3
        prev_mel = jax.random.normal(rngk, (2, Tr, cfg.n_mels))
        spk_a = jax.random.normal(jax.random.PRNGKey(4), (2, cfg.spk_embed_dim))
        spk_b = jax.random.normal(jax.random.PRNGKey(5), (2, cfg.spk_embed_dim))
        out_a = model.apply(variables, enc, prev_mel, jnp.asarray([Tr, Tr]),
                            spk_a, method="decode_speech")[0]
        out_b = model.apply(variables, enc, prev_mel, jnp.asarray([Tr, Tr]),
                            spk_b, method="decode_speech")[0]
        # a different x-vector must change the decode in every mode
        assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-6

    @pytest.mark.parametrize("mode", ["add", "concat"])
    def test_incremental_matches_full(self, mode):
        from speecht5_tpu.config import speecht5_tiny
        from dataclasses import replace

        cfg = replace(speecht5_tiny(), spk_embed_integration=mode)
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        rngk = jax.random.PRNGKey(2)
        wav = jax.random.normal(rngk, (1, 4000)) * 0.1
        enc = model.apply(variables, wav, jnp.asarray([4000]),
                          method="encode_speech")
        Tr = 4
        prev_mel = jax.random.normal(rngk, (1, Tr, cfg.n_mels))
        spk = jax.random.normal(rngk, (1, cfg.spk_embed_dim))
        before = model.apply(variables, enc, prev_mel, jnp.asarray([Tr]), spk,
                             method="decode_speech")[0]
        cache = model.apply(variables, enc, 1, 8, spkembs=spk,
                            method="init_speech_cache")
        frames_all = []
        for t in range(Tr):
            frames, _, cache, _ = model.apply(
                variables, prev_mel[:, t : t + 1], cache, spkembs=spk,
                enc_valid=enc["valid_mask"], method="speech_decode_step",
            )
            frames_all.append(np.asarray(frames))
        np.testing.assert_allclose(
            np.asarray(before), np.concatenate(frames_all, axis=1),
            atol=2e-4, rtol=1e-3,
        )

    def test_config_validation(self):
        from dataclasses import replace
        from speecht5_tpu.config import speecht5_tiny

        with pytest.raises(ValueError, match="spk_embed_integration"):
            replace(speecht5_tiny(), spk_embed_integration="bogus")
        with pytest.raises(ValueError, match="se_predict"):
            replace(speecht5_tiny(), se_predict="bogus")


class TestConvLowering:
    def test_polyphase_conv_matches_xla(self):
        """conv_features.impl='polyphase' computes the same features from the
        same params as the XLA conv lowering (prenets._PolyphaseConv)."""
        from dataclasses import replace
        from speecht5_tpu.config import ConvFeatureConfig
        from speecht5_tpu.models.prenets import ConvFeatureExtractor

        cfg_x = ConvFeatureConfig()  # full w2v2 stack incl. k=10/s=5, k=2/s=2
        cfg_p = replace(cfg_x, impl="polyphase")
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
        m_x = ConvFeatureExtractor(cfg_x)
        vs = m_x.init(jax.random.PRNGKey(0), wav)
        out_x = m_x.apply(vs, wav)
        out_p = ConvFeatureExtractor(cfg_p).apply(vs, wav)  # same params
        assert out_x.shape == out_p.shape
        np.testing.assert_allclose(
            np.asarray(out_x), np.asarray(out_p), atol=2e-5, rtol=1e-4
        )

    def test_polyphase_conv_with_bias(self):
        from dataclasses import replace
        from speecht5_tpu.config import ConvFeatureConfig
        from speecht5_tpu.models.prenets import ConvFeatureExtractor

        cfg_x = ConvFeatureConfig(
            layers=((64, 3, 2), (64, 2, 2)), bias=True, mode="layer_norm"
        )
        cfg_p = replace(cfg_x, impl="polyphase")
        rng = np.random.default_rng(1)
        wav = jnp.asarray(rng.standard_normal((2, 999)), jnp.float32)
        m_x = ConvFeatureExtractor(cfg_x)
        vs = m_x.init(jax.random.PRNGKey(0), wav)
        out_x = m_x.apply(vs, wav)
        out_p = ConvFeatureExtractor(cfg_p).apply(vs, wav)
        np.testing.assert_allclose(
            np.asarray(out_x), np.asarray(out_p), atol=2e-5, rtol=1e-4
        )

    def test_attn_scores_dtype_flag(self):
        """attn_scores_f32=False is a pure layout/traffic choice: at f32
        compute dtype the program is identical (score_dtype == f32)."""
        from dataclasses import replace
        from speecht5_tpu.config import speecht5_tiny

        cfg = speecht5_tiny()  # default attn_scores_f32=False
        cfg2 = replace(
            cfg,
            encoder=replace(cfg.encoder, attn_scores_f32=True),
            decoder=replace(cfg.decoder, attn_scores_f32=True),
        )
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        model2 = SpeechT5Model(cfg2)
        wav = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 4000)), jnp.float32)
        lengths = jnp.asarray([4000, 2000])
        e1 = model.apply(variables, wav, lengths, method="encode_speech")
        e2 = model2.apply(variables, wav, lengths, method="encode_speech")
        np.testing.assert_array_equal(
            np.asarray(e1["encoder_out"]), np.asarray(e2["encoder_out"]))
