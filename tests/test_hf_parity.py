"""Full-model numeric parity against the HuggingFace torch SpeechT5.

The released SpeechT5 checkpoints are distributed in transformers format
(microsoft/speecht5_{asr,tts,vc,hifigan}); transformers' modeling_speecht5.py
is a faithful port of the reference fairseq implementation (reference
models/speecht5.py).  Randomly-initialized torch models therefore serve as a
*full-model* oracle: convert their state dict with utils/convert_hf.py and
require the entire forward (conv feature extractor -> encoder with rel-pos
bias -> decoder -> task postnet) to agree to float32 tolerance.  This is
end-to-end evidence that loading the real released weights reproduces the
released models.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
import flax.linen as nn

from speecht5_tpu.models.speecht5 import SpeechT5Model
from speecht5_tpu.utils.convert_hf import (
    convert_hf_state_dict,
    hf_config_to_ours,
    load_hf_checkpoint,
)

ATOL = 2e-4


def tiny_hf_config(**kw):
    from transformers import SpeechT5Config

    base = dict(
        vocab_size=41,
        hidden_size=32,
        encoder_layers=2,
        encoder_attention_heads=2,
        encoder_ffn_dim=48,
        decoder_layers=2,
        decoder_attention_heads=2,
        decoder_ffn_dim=48,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=16,
        encoder_max_relative_position=8,
        speech_decoder_prenet_layers=2,
        speech_decoder_prenet_units=16,
        speech_decoder_postnet_layers=2,
        speech_decoder_postnet_units=12,
        speech_decoder_postnet_kernel=5,
        speaker_embedding_dim=8,
        max_speech_positions=512,
        max_text_positions=64,
        positional_dropout=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        speech_decoder_prenet_dropout=0.0,
        speech_decoder_postnet_dropout=0.0,
        apply_spec_augment=False,
    )
    base.update(kw)
    return SpeechT5Config(**base)


def to_jnp(x):
    return jnp.asarray(np.asarray(x), jnp.float32)


@pytest.fixture(scope="module")
def asr_pair():
    from transformers import SpeechT5ForSpeechToText

    torch.manual_seed(0)
    hf = SpeechT5ForSpeechToText(tiny_hf_config()).eval()
    cfg, variables, unknown = load_hf_checkpoint(hf)
    assert unknown == [], f"unmapped HF keys: {unknown}"
    return hf, cfg, variables


def test_asr_full_model_logits_parity(asr_pair):
    """waveform -> conv FE -> encoder (rel-pos bias) -> decoder -> lm head."""
    hf, cfg, variables = asr_pair
    model = SpeechT5Model(cfg)

    rng = np.random.default_rng(0)
    B, T = 2, 3200
    wav = rng.standard_normal((B, T)).astype(np.float32) * 0.1
    prev = rng.integers(4, cfg.vocab_size, size=(B, 7)).astype(np.int64)
    prev[:, 0] = cfg.eos_id

    with torch.no_grad():
        ref = hf(
            input_values=torch.from_numpy(wav),
            decoder_input_ids=torch.from_numpy(prev),
        ).logits.numpy()

    def f(m):
        enc = m.encode_speech(
            jnp.asarray(wav), jnp.full((B,), T, jnp.int32),
            mask=False, deterministic=True, with_ctc=False,
        )
        return m.decode_text(enc, jnp.asarray(prev), deterministic=True)

    ours = np.asarray(nn.apply(f, model)(variables))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-3)


def test_asr_parity_with_padding(asr_pair):
    """Padded batch: per-row waveform lengths must reproduce HF's reduced
    attention mask semantics through the encoder and cross-attention."""
    hf, cfg, variables = asr_pair
    model = SpeechT5Model(cfg)

    rng = np.random.default_rng(1)
    B, T = 2, 3200
    lengths = np.array([T, 2100], np.int32)
    wav = rng.standard_normal((B, T)).astype(np.float32) * 0.1
    wav[1, lengths[1]:] = 0.0
    attn = np.zeros((B, T), np.int64)
    for b in range(B):
        attn[b, : lengths[b]] = 1
    prev = rng.integers(4, cfg.vocab_size, size=(B, 5)).astype(np.int64)
    prev[:, 0] = cfg.eos_id

    with torch.no_grad():
        ref = hf(
            input_values=torch.from_numpy(wav),
            attention_mask=torch.from_numpy(attn),
            decoder_input_ids=torch.from_numpy(prev),
        ).logits.numpy()

    def f(m):
        enc = m.encode_speech(
            jnp.asarray(wav), jnp.asarray(lengths),
            mask=False, deterministic=True, with_ctc=False,
        )
        return m.decode_text(enc, jnp.asarray(prev), deterministic=True)

    ours = np.asarray(nn.apply(f, model)(variables))
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-3)


def test_tts_full_model_mel_parity(monkeypatch):
    """text -> encoder -> speech decoder prenet (+spk emb) -> decoder ->
    feat/prob/postnet.  HF's always-on Tacotron prenet dropout is patched to
    identity (our prenet skips dropout when no 'prenet' RNG is supplied), so
    both sides run the same deterministic math."""
    from transformers import SpeechT5ForTextToSpeech
    from transformers.models.speecht5 import modeling_speecht5 as hf_mod

    monkeypatch.setattr(
        hf_mod.SpeechT5SpeechDecoderPrenet,
        "_consistent_dropout",
        lambda self, x, p: x,
    )

    torch.manual_seed(1)
    hf = SpeechT5ForTextToSpeech(tiny_hf_config()).eval()
    cfg, variables, unknown = load_hf_checkpoint(hf)
    assert unknown == [], f"unmapped HF keys: {unknown}"
    model = SpeechT5Model(cfg)

    rng = np.random.default_rng(2)
    B, TOK = 2, 9
    tokens = rng.integers(4, cfg.vocab_size, size=(B, TOK)).astype(np.int64)
    n_frames = 12  # full-resolution mel frames (divisible by r=2)
    mel = rng.standard_normal((B, n_frames, cfg.n_mels)).astype(np.float32)
    spk = rng.standard_normal((B, cfg.spk_embed_dim)).astype(np.float32)

    # r-thinned, right-shifted decoder input (reference
    # text_to_speech_dataset.py:241-248; HF shift_spectrograms_right)
    thinned = mel[:, cfg.reduction_factor - 1 :: cfg.reduction_factor]
    prev = np.zeros_like(thinned)
    prev[:, 1:] = thinned[:, :-1]

    with torch.no_grad():
        h = hf.speecht5(
            input_values=torch.from_numpy(tokens),
            decoder_input_values=torch.from_numpy(prev),
            speaker_embeddings=torch.from_numpy(spk),
        ).last_hidden_state
        ref_before, ref_after, ref_logits = hf.speech_decoder_postnet(h)

    def f(m):
        enc = m.encode_text(jnp.asarray(tokens), deterministic=True)
        return m.decode_speech(
            enc, jnp.asarray(prev), None, jnp.asarray(spk), deterministic=True
        )

    before, after, stop_logits, _ = nn.apply(f, model)(variables)
    np.testing.assert_allclose(
        np.asarray(before), ref_before.numpy(), atol=ATOL, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(after), ref_after.numpy(), atol=ATOL, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(stop_logits), ref_logits.numpy(), atol=ATOL, rtol=1e-3
    )


def test_vc_state_dict_fully_mapped():
    """SpeechT5ForSpeechToSpeech (VC): every key maps (speech prenet on both
    sides plus speech postnet — exercises the union of the namespaces)."""
    from transformers import SpeechT5ForSpeechToSpeech

    torch.manual_seed(2)
    hf = SpeechT5ForSpeechToSpeech(tiny_hf_config()).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, batch_stats, unknown = convert_hf_state_dict(sd)
    assert unknown == []
    assert "speech_encoder_prenet" in params
    assert "speech_decoder_prenet" in params
    assert "postnet" in params["speech_decoder_postnet"]
    assert "bn_0" in batch_stats["speech_decoder_postnet"]["postnet"]


def test_hifigan_hf_parity():
    """SpeechT5HifiGan (vocoder) vs our HiFiGANGenerator through the existing
    fairseq-style converter (it already accepts HF naming)."""
    from transformers import SpeechT5HifiGanConfig, SpeechT5HifiGan
    from speecht5_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from speecht5_tpu.utils.convert import convert_hifigan_state_dict

    torch.manual_seed(3)
    hf_cfg = SpeechT5HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]],
        normalize_before=True,  # exercise the mel standardization path too
    )
    hf = SpeechT5HifiGan(hf_cfg).eval()
    # remove_weight_norm not needed: converter reads g/v pairs
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hifigan_state_dict(sd)

    ours = HiFiGANGenerator(
        HiFiGANConfig(
            in_dim=8,
            upsample_initial_channel=16,
            upsample_rates=(4, 4),
            upsample_kernel_sizes=(8, 8),
            resblock_kernel_sizes=(3,),
            resblock_dilations=((1, 3),),
        )
    )
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 20, 8)).astype(np.float32)
    with torch.no_grad():
        # HF expects [B, T, in_dim] (unbatched [T, in_dim] also allowed)
        ref = hf(torch.from_numpy(mel)).numpy()
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(mel)))
    np.testing.assert_allclose(out.reshape(-1), ref.reshape(-1), atol=ATOL, rtol=1e-3)


def test_hf_config_mapping():
    hf_cfg = tiny_hf_config()
    cfg = hf_config_to_ours(hf_cfg)
    assert cfg.d_model == hf_cfg.hidden_size
    assert cfg.encoder.num_layers == hf_cfg.encoder_layers
    assert cfg.decoder.num_layers == hf_cfg.decoder_layers
    assert cfg.encoder.rel_pos.max_distance == hf_cfg.encoder_max_relative_position
    assert not cfg.decoder.use_rel_pos_bias
    assert cfg.conv_features.layers[0] == (512, 10, 5)
    assert cfg.spk_embed_dim == hf_cfg.speaker_embedding_dim
