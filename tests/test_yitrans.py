"""YiTrans tests: joint pretrain forward, ASR/MT/ST fine-tune forwards, and
jitted beam decode through the shared ASRDecoder.

Behavioral spec: reference YiTrans/yitrans_iwslt22/models/pretrain_ed.py:200,
finetune_asr.py:115, finetune_mt.py:89, finetune_st.py:85."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht5_tpu.models.yitrans import YiTransModel, yitrans_tiny
from speecht5_tpu.decode.asr import ASRDecoder

RNGS = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}


@pytest.fixture(scope="module")
def yitrans():
    cfg = yitrans_tiny()
    model = YiTransModel(cfg)
    wav = jnp.zeros((2, 4000))
    lengths = jnp.asarray([4000, 4000])
    tokens = jnp.full((2, 6), 5, jnp.int32)
    variables = jax.jit(
        lambda: model.init(RNGS, wav, lengths, tokens, tokens,
                           method="init_all")
    )()
    return cfg, model, variables


class TestYiTransForwards:
    def test_forward_asr(self, yitrans):
        cfg, m, v = yitrans
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 2000])
        prev = jnp.full((2, 5), cfg.eos_id, jnp.int32)
        logits, ctc_logits, enc_valid = m.apply(
            v, wav, lengths, prev, mask=True,
            rngs={"mask": jax.random.PRNGKey(2)}, method="forward_asr",
        )
        frames = cfg.conv_features.out_length(4000)
        assert logits.shape == (2, 5, cfg.vocab_size)
        assert ctc_logits.shape == (2, frames, cfg.vocab_size)
        # shorter row has fewer valid encoder frames
        nv = np.asarray(enc_valid).sum(-1)
        assert nv[1] < nv[0]
        assert np.isfinite(np.asarray(logits)).all()

    def test_forward_mt(self, yitrans):
        cfg, m, v = yitrans
        src = jnp.full((2, 7), 9, jnp.int32)
        prev = jnp.full((2, 5), cfg.eos_id, jnp.int32)
        logits = m.apply(v, src, prev, deterministic=True, method="forward_mt")
        assert logits.shape == (2, 5, cfg.vocab_size)

    def test_forward_st_no_ctc(self, yitrans):
        cfg, m, v = yitrans
        wav = jnp.zeros((1, 4000))
        prev = jnp.full((1, 4), cfg.eos_id, jnp.int32)
        logits = m.apply(
            v, wav, jnp.asarray([4000]), prev, deterministic=True,
            method="forward_st",
        )
        assert logits.shape == (1, 4, cfg.vocab_size)

    def test_forward_pretrain(self, yitrans):
        cfg, m, v = yitrans
        wav = jnp.zeros((2, 4000))
        lengths = jnp.asarray([4000, 4000])
        noised = jnp.full((2, 6), 5, jnp.int32)
        prev = jnp.full((2, 6), cfg.eos_id, jnp.int32)
        out = m.apply(
            v, wav, lengths, noised, prev,
            rngs={"mask": jax.random.PRNGKey(3)}, deterministic=True,
            method="forward_pretrain",
        )
        frames = cfg.conv_features.out_length(4000)
        assert out["speech_logits"].shape == (2, frames, cfg.unit_vocab_size)
        assert out["text_logits"].shape == (2, 6, cfg.vocab_size)
        assert out["time_mask"] is not None
        assert np.asarray(out["time_mask"]).any()

    def test_step_decode_matches_teacher_forcing(self, yitrans):
        """KV-cached text_decode_step must reproduce full decode_text logits."""
        cfg, m, v = yitrans
        wav = jnp.zeros((1, 4000))
        enc = m.apply(v, wav, jnp.asarray([4000]), deterministic=True,
                      method="encode_speech")
        prev = jnp.asarray([[cfg.eos_id, 5, 9, 11]])
        full = np.asarray(
            m.apply(v, enc, prev, deterministic=True, method="decode_text")
        )
        cache = m.apply(v, enc, 1, prev.shape[1] + 1, method="init_text_cache")
        steps = []
        for t in range(prev.shape[1]):
            logits, cache = m.apply(
                v, prev[:, t : t + 1], cache, enc_valid=enc["valid_mask"],
                method="text_decode_step",
            )
            steps.append(np.asarray(logits))
        np.testing.assert_allclose(
            np.stack(steps, axis=1), full, atol=2e-3
        )


class TestYiTransBeamDecode:
    def test_asr_decoder_integration(self, yitrans):
        cfg, m, v = yitrans
        dec = ASRDecoder(m, v, beam_size=3, max_len=8, ctc_weight=0.3)
        res = dec(jnp.zeros((2, 4000)), jnp.asarray([4000, 2500]))
        scores = np.asarray(res.scores)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
        assert np.isfinite(scores[:, 0]).all()
        for b in range(2):
            assert toks[b, 0, lens[b, 0] - 1] == cfg.eos_id
