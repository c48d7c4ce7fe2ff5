"""Prosody-SpeechT5 (paper-level reconstruction, arXiv 2211.11275 — the
reference advertises the family with no code, README.md:17,24-28).

Gates: training forward shape/finiteness + distillation loss; prosody
embeddings separate utterance styles; transfer conditioning actually
changes the synthesized mel; the stock TTSDecoder drives the model
(predictor path) unchanged.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speecht5_tpu.config import speecht5_tiny
from speecht5_tpu.models.prosody import (
    ProsodyConfig, ProsodySpeechT5, init_prosody_speecht5,
)

PCFG = ProsodyConfig(dim=8, conv_channels=16, n_convs=2, predictor_hidden=16)


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = speecht5_tiny()
    return (cfg,) + init_prosody_speecht5(
        cfg, jax.random.PRNGKey(0), PCFG)


def _batch(cfg, rng, B=2, L=6, mel_len=8):
    r = cfg.reduction_factor
    mel_len -= mel_len % r
    return {
        "tokens": jnp.asarray(rng.integers(5, cfg.vocab_size, (B, L)),
                              jnp.int32),
        "prev_mel": jnp.asarray(
            rng.standard_normal((B, mel_len // r, cfg.n_mels)), jnp.float32),
        "target_mel": jnp.asarray(
            rng.standard_normal((B, mel_len, cfg.n_mels)), jnp.float32),
        "dec_lengths": jnp.full((B,), mel_len, jnp.int32),
        "spk": jnp.asarray(rng.standard_normal((B, cfg.spk_embed_dim)),
                           jnp.float32),
    }


class TestTraining:
    def test_forward_shapes_and_pred_loss(self, model_and_vars, rng):
        cfg, model, variables = model_and_vars
        b = _batch(cfg, rng)
        before, after, stop, attn, pred_loss = model.apply(
            variables, b["tokens"], b["prev_mel"],
            b["dec_lengths"] // cfg.reduction_factor, b["spk"],
            b["target_mel"], b["dec_lengths"],
            deterministic=True, method="forward_t2s",
            rngs={"prenet": jax.random.PRNGKey(1)},
        )
        assert before.shape == b["target_mel"].shape
        assert after.shape == b["target_mel"].shape
        assert np.isfinite(np.asarray(after)).all()
        assert np.isfinite(float(pred_loss)) and float(pred_loss) >= 0

    def test_pred_loss_distills_not_backprops_encoder(self, model_and_vars,
                                                      rng):
        """stop_gradient on the target: the distillation term's gradient
        w.r.t. the PROSODY-ENCODER params is exactly zero."""
        cfg, model, variables = model_and_vars
        b = _batch(cfg, rng)

        def loss_fn(params):
            *_, pred_loss = model.apply(
                {**variables, "params": params}, b["tokens"], b["prev_mel"],
                b["dec_lengths"] // cfg.reduction_factor, b["spk"],
                b["target_mel"], b["dec_lengths"],
                deterministic=True, method="forward_t2s",
                rngs={"prenet": jax.random.PRNGKey(1)},
            )
            return pred_loss

        g = jax.grad(loss_fn)(variables["params"])
        enc_g = jax.tree_util.tree_leaves(g["prosody_encoder"])
        assert all(float(jnp.abs(x).max()) == 0.0 for x in enc_g)
        pred_g = jax.tree_util.tree_leaves(g["prosody_predictor"])
        assert any(float(jnp.abs(x).max()) > 0 for x in pred_g)


class TestProsodyEmbedding:
    def test_styles_separate(self, model_and_vars, rng):
        """Two synthetic styles (loud/fast-varying vs quiet/slow): same-style
        embedding distance < cross-style distance, even at random init."""
        cfg, model, variables = model_and_vars

        def style_mel(kind, seed):
            g = np.random.default_rng(seed)
            t = np.arange(16)[:, None]
            if kind == "a":
                m = 3.0 * np.sin(t * 1.1) + 0.1 * g.standard_normal(
                    (16, cfg.n_mels))
            else:
                m = 0.2 * np.sin(t * 0.1) + 0.1 * g.standard_normal(
                    (16, cfg.n_mels))
            return m.astype(np.float32)

        mels = np.stack([style_mel("a", 0), style_mel("a", 1),
                         style_mel("b", 2), style_mel("b", 3)])
        emb = np.asarray(model.apply(
            variables, jnp.asarray(mels), jnp.full((4,), 16, jnp.int32),
            method="prosody_embedding"))
        d_same = (np.linalg.norm(emb[0] - emb[1])
                  + np.linalg.norm(emb[2] - emb[3]))
        d_cross = (np.linalg.norm(emb[0] - emb[2])
                   + np.linalg.norm(emb[1] - emb[3]))
        assert d_cross > d_same, (d_same, d_cross)

    def test_transfer_changes_encoding(self, model_and_vars, rng):
        cfg, model, variables = model_and_vars
        tokens = jnp.asarray([[5, 6, 7, 2]], jnp.int32)
        ref1 = jnp.asarray(0.5 * rng.standard_normal((1, 12, cfg.n_mels)),
                           jnp.float32)
        ref2 = jnp.asarray(0.5 * rng.standard_normal((1, 12, cfg.n_mels)),
                           jnp.float32)
        lengths = jnp.full((1,), 12, jnp.int32)
        e1 = model.apply(variables, tokens, ref1, lengths,
                         method="encode_text_ref")
        e2 = model.apply(variables, tokens, ref2, lengths,
                         method="encode_text_ref")
        diff = float(jnp.abs(e1["encoder_out"] - e2["encoder_out"]).max())
        assert diff > 1e-4


class TestInference:
    def test_stock_ttsdecoder_drives_predictor_path(self, model_and_vars):
        from speecht5_tpu.decode.tts import TTSDecoder

        cfg, model, variables = model_and_vars
        tts = TTSDecoder(model, variables, max_frames=16)
        out = tts.text_to_speech(
            jnp.asarray([[5, 6, 7, 2]], jnp.int32),
            jnp.zeros((1, cfg.spk_embed_dim)),
        )
        mel = np.asarray(out.mel)
        assert mel.shape[-1] == cfg.n_mels
        assert np.isfinite(mel).all()
        assert int(np.asarray(out.lengths)[0]) > 0
