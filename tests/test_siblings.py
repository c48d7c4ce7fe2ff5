"""Sibling model families on the shared substrate: SpeechLM, Speech2C, SpeechUT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht5_tpu.config import speecht5_tiny, TransformerConfig, RelPosConfig
from speecht5_tpu.models.speechlm import (
    SpeechLMModel, SpeechLMCtc, SpeechLMS2T, speechlm_tiny,
)
from speecht5_tpu.models.speech2c import Speech2CModel
from speecht5_tpu.models.speechut import SpeechUTModel, speechut_tiny


RNGS = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
        "mix": jax.random.PRNGKey(2)}


class TestSpeechLM:
    @pytest.fixture(scope="class")
    def model(self):
        cfg = speechlm_tiny()
        model = SpeechLMModel(cfg)
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 4000])
        frames = cfg.conv_features.out_length(4000)
        targets = jnp.zeros((2, frames), jnp.int32)
        variables = model.init(
            RNGS, wav, lengths, targets, mask=True, method="forward_speech"
        )
        return cfg, model, variables

    def test_speech_branch(self, model):
        cfg, m, v = model
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 2000])
        frames = cfg.conv_features.out_length(4000)
        targets = jnp.zeros((2, frames), jnp.int32)
        out = m.apply(v, wav, lengths, targets, mask=True,
                      rngs={"mask": jax.random.PRNGKey(3), "mix": jax.random.PRNGKey(4)},
                      method="forward_speech")
        assert out["logits_0"].shape == (2, frames, cfg.unit_vocab_size)
        assert out["logits_1"].shape == (2, frames, cfg.unit_vocab_size)
        assert out["time_mask"] is not None

    def test_text_branch(self, model):
        cfg, m, v = model
        units = jnp.full((2, 12), 5, jnp.int32)
        # init text branch params too
        v2 = SpeechLMModel(cfg).init(RNGS, units, mask=True, method="forward_text")
        params = dict(v2["params"]); params.update(v["params"])
        out = SpeechLMModel(cfg).apply(
            {"params": params}, units, mask=True,
            rngs={"mask": jax.random.PRNGKey(5)}, method="forward_text",
        )
        assert out["mum_logits"].shape == (2, 12, cfg.unit_vocab_size)
        assert out["ctc_logits"].shape == (2, 12, cfg.text_vocab_size)

    def test_ctc_finetune_head(self):
        cfg = speechlm_tiny()
        m = SpeechLMCtc(cfg, ctc_vocab_size=16)
        wav = jnp.zeros((1, 4000))
        v = m.init(RNGS, wav, jnp.asarray([4000]))
        logits, valid = m.apply(v, wav, jnp.asarray([4000]))
        assert logits.shape[-1] == 16
        assert logits.shape[1] == valid.shape[1]

    def test_st_finetune_head(self):
        cfg = speechlm_tiny()
        dec = TransformerConfig(
            d_model=64, ffn_dim=128, num_layers=2, num_heads=4,
            dropout=0.0, rel_pos=RelPosConfig(max_distance=16),
            use_rel_pos_bias=False,
        )
        m = SpeechLMS2T(cfg, dec, tgt_vocab_size=50)
        wav = jnp.zeros((1, 4000))
        prev = jnp.asarray([[2, 5, 6]])
        v = m.init(RNGS, wav, jnp.asarray([4000]), prev)
        logits, valid = m.apply(v, wav, jnp.asarray([4000]), prev)
        assert logits.shape == (1, 3, 50)


class TestSpeech2C:
    def test_pretrain_and_asr(self):
        cfg = speecht5_tiny()
        m = Speech2CModel(cfg)
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 4000])
        prev = jnp.asarray([[2, 5, 6], [2, 7, 8]])
        v = m.init(RNGS, wav, lengths, prev, method="init_all")
        out = m.apply(
            v, wav, lengths, prev, rngs={"mask": jax.random.PRNGKey(1)},
            deterministic=True, method="forward_pretrain",
        )
        assert out["dec_logits"].shape == (2, 3, cfg.vocab_size)
        assert len(out["hubert_logits"]) == 1
        logits, ctc_logits, valid = m.apply(
            v, wav, lengths, prev, mask=False, deterministic=True,
            method="forward_asr",
        )
        assert ctc_logits.shape[-1] == cfg.vocab_size

    def test_beam_decode_compatible(self):
        """Speech2C plugs into the shared ASRDecoder."""
        from speecht5_tpu.decode.asr import ASRDecoder

        cfg = speecht5_tiny()
        m = Speech2CModel(cfg)
        wav = jnp.zeros((1, 4000))
        lengths = jnp.asarray([4000])
        prev = jnp.asarray([[2, 5, 6]])
        v = m.init(RNGS, wav, lengths, prev, method="init_all")
        dec = ASRDecoder(m, v, beam_size=2, max_len=6, ctc_weight=0.2)
        res = dec(wav, lengths)
        assert np.isfinite(np.asarray(res.scores)).all()


class TestSpeechUT:
    def test_all_branches(self):
        cfg = speechut_tiny()
        m = SpeechUTModel(cfg)
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 4000])
        frames = cfg.conv_features.out_length(4000)
        units = jnp.full((2, frames), 5, jnp.int32)
        prev = jnp.asarray([[2, 5, 6], [2, 7, 8]])
        v = m.init(RNGS, wav, lengths, units, prev, method="init_all")

        out = m.apply(
            v, wav, lengths, units, mask=True,
            rngs={"mask": jax.random.PRNGKey(1), "mix": jax.random.PRNGKey(2)},
            method="forward_speech",
        )
        assert out["hubert_logits"].shape == (2, frames, cfg.unit_vocab_size)
        assert out["encoder_out"].shape == (2, frames, cfg.d_model)

        mum = m.apply(
            v, units, rngs={"mask": jax.random.PRNGKey(3)}, method="forward_mum"
        )
        assert mum["mum_logits"].shape == (2, frames, cfg.unit_vocab_size)

        ut = m.apply(v, units, prev, method="forward_unit_text")
        assert ut["dec_logits"].shape == (2, 3, cfg.text_vocab_size)
        assert ut["ctc_logits"].shape == (2, frames, cfg.text_vocab_size)

    def test_st_beam_decode(self):
        from speecht5_tpu.decode.asr import ASRDecoder

        cfg = speechut_tiny()
        m = SpeechUTModel(cfg)
        wav = jnp.zeros((1, 4000))
        lengths = jnp.asarray([4000])
        frames = cfg.conv_features.out_length(4000)
        units = jnp.full((1, frames), 5, jnp.int32)
        prev = jnp.asarray([[2, 5, 6]])
        v = m.init(RNGS, wav, lengths, units, prev, method="init_all")
        dec = ASRDecoder(m, v, beam_size=2, max_len=6, ctc_weight=0.2)
        res = dec(wav, lengths)
        assert np.isfinite(np.asarray(res.scores)).all()


class TestSpeech2SChain:
    def test_unit_decode_to_code_hifigan(self):
        """The S2ST chain wiring: SpeechUT substrate unit beam decode ->
        CodeHiFiGAN waveform (reference Speech2S stpretrain_scripts/
        decode_text2code_beam2.sh + eval2.sh; recipes/speech2s_s2st.py is
        the trained end-to-end demo)."""
        import jax
        import jax.numpy as jnp
        from speecht5_tpu.models.speechut import SpeechUTModel, speechut_tiny
        from speecht5_tpu.decode.asr import ASRDecoder
        from speecht5_tpu.models.hifigan import (
            CodeHiFiGAN, CodeHiFiGANConfig, HiFiGANConfig,
        )

        cfg = speechut_tiny(text_vocab_size=13)
        model = SpeechUTModel(cfg)
        wav = jnp.zeros((2, 4000))
        wlen = jnp.asarray([4000, 2500])
        T_frames = int(cfg.conv_features.out_length(4000))
        fu = jnp.full((2, T_frames), 5, jnp.int32)
        prev = jnp.full((2, 3), 5, jnp.int32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
             "mix": jax.random.PRNGKey(2)},
            wav, wlen, fu, prev, method="init_all",
        )
        dec = ASRDecoder(model, variables, beam_size=2, max_len=5)
        res = dec(wav, wlen)
        toks = np.asarray(res.tokens)[:, 0]
        lens = np.asarray(res.lengths)[:, 0]
        units = jnp.asarray(
            np.clip(toks[:, 1:4], 5, 12) , jnp.int32)
        voc = CodeHiFiGAN(CodeHiFiGANConfig(
            num_units=13, embed_dim=16, dur_predictor=True, max_duration=2,
            generator=HiFiGANConfig(
                in_dim=16, upsample_initial_channel=32,
                upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
                normalize_before=False,
            )))
        vvars = voc.init(jax.random.PRNGKey(3), units)
        out = np.asarray(voc.apply(vvars, units))
        assert out.shape == (2, 3 * 2 * 8)
        assert np.isfinite(out).all()
        assert (lens >= 2).all()
