"""Conversion-oracle parity at the RELEASED model geometries.

Every other conversion oracle runs at tiny geometry (hidden 32-64, 2
layers); a scale-dependent weight-mapping bug — rel-pos table size 160,
conv-pos kernel 128 / groups 16, the 7-layer conv feature extractor, the
4-layer speech-prenet cascade at true widths, 12+6 transformer layers —
would survive those and surface only on checkpoint day.  These slow tests
are the insurance: random-init the HF torch SpeechT5 at the released Base
ASR and TTS geometries (transformers' defaults ARE the released geometry,
microsoft/speecht5_{asr,tts}), convert with utils/convert_hf.py, and
require full-forward parity; plus fairseq-layout round trips at the Base
and Large presets (reference SpeechT5/speecht5/models/speecht5.py:1385-1425
arch presets) through utils/convert.py.

Run: python -m pytest tests/test_fullscale_parity.py -m slow -q
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
import flax.linen as nn

from speecht5_tpu.models.speecht5 import SpeechT5Model, init_model
from speecht5_tpu.utils.convert_hf import load_hf_checkpoint
from speecht5_tpu.utils.convert import convert_state_dict, verify_against

# float32 end-to-end through 18 transformer layers at width 768 accumulates
# more rounding than the tiny oracle; 1e-3 still catches any mapping error
# (a transposed or mis-sliced weight diverges by O(1)).
ATOL = 1e-3
RTOL = 1e-3

pytestmark = pytest.mark.slow


def released_hf_config(**kw):
    """transformers' SpeechT5Config defaults = the released Base geometry
    (hidden 768, 12 enc + 6 dec layers, conv-pos 128/16, rel-pos 160)."""
    from transformers import SpeechT5Config

    base = dict(apply_spec_augment=False)
    base.update(kw)
    return SpeechT5Config(**base)


def test_hf_asr_released_base_geometry_full_forward_parity():
    """waveform -> 7-layer conv FE -> 12-layer encoder (rel-pos 160, conv-pos
    128/16) -> 6-layer decoder -> lm head, at hidden 768: the exact tensor
    shapes checkpoint-day conversion of microsoft/speecht5_asr sees."""
    from transformers import SpeechT5ForSpeechToText

    torch.manual_seed(0)
    hf = SpeechT5ForSpeechToText(released_hf_config()).eval()
    cfg, variables, unknown = load_hf_checkpoint(hf)
    assert unknown == [], f"unmapped HF keys: {unknown}"
    assert cfg.d_model == 768 and cfg.encoder.num_layers == 12
    assert cfg.conv_pos == 128 and cfg.conv_pos_groups == 16
    assert cfg.encoder.rel_pos.max_distance == 160
    model = SpeechT5Model(cfg)

    rng = np.random.default_rng(0)
    B, T = 2, 16000
    wav = rng.standard_normal((B, T)).astype(np.float32) * 0.1
    prev = rng.integers(4, cfg.vocab_size, size=(B, 12)).astype(np.int64)
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
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=RTOL)


def test_hf_tts_released_base_geometry_full_forward_parity(monkeypatch):
    """text -> encoder -> speech decoder prenet (256 units + 512-dim spk
    emb) -> decoder -> feat/prob/5-layer postnet at released widths.  HF's
    always-on Tacotron prenet dropout is patched to identity (our prenet
    skips dropout when no 'prenet' RNG is supplied)."""
    from transformers import SpeechT5ForTextToSpeech
    from transformers.models.speecht5 import modeling_speecht5 as hf_mod

    monkeypatch.setattr(
        hf_mod.SpeechT5SpeechDecoderPrenet,
        "_consistent_dropout",
        lambda self, x, p: x,
    )

    torch.manual_seed(1)
    hf = SpeechT5ForTextToSpeech(released_hf_config()).eval()
    cfg, variables, unknown = load_hf_checkpoint(hf)
    assert unknown == [], f"unmapped HF keys: {unknown}"
    assert cfg.spk_embed_dim == 512 and cfg.n_mels == 80
    model = SpeechT5Model(cfg)

    rng = np.random.default_rng(2)
    B, TOK = 2, 11
    tokens = rng.integers(4, cfg.vocab_size, size=(B, TOK)).astype(np.int64)
    n_frames = 16
    mel = rng.standard_normal((B, n_frames, cfg.n_mels)).astype(np.float32)
    spk = rng.standard_normal((B, cfg.spk_embed_dim)).astype(np.float32)

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
            enc, jnp.asarray(prev), None, jnp.asarray(spk),
            deterministic=True,
        )

    before, after, stop_logits, _ = nn.apply(f, model)(variables)
    np.testing.assert_allclose(
        np.asarray(before), ref_before.numpy(), atol=ATOL, rtol=RTOL
    )
    np.testing.assert_allclose(
        np.asarray(after), ref_after.numpy(), atol=ATOL, rtol=RTOL
    )
    np.testing.assert_allclose(
        np.asarray(stop_logits), ref_logits.numpy(), atol=ATOL, rtol=RTOL
    )


@pytest.mark.parametrize("preset", ["speecht5_base_asr", "speecht5_large"])
def test_fairseq_round_trip_released_geometry(preset):
    """fairseq-layout state-dict round trip at the released Base and Large
    presets (reference speecht5.py:1385-1425): every parameter of the
    full-scale tree must have a torch-side name, convert back bit-exactly,
    and leave no missing/extra/mismatched entries."""
    from speecht5_tpu import config as C
    from test_convert import flatten, inverse_key

    cfg = getattr(C, preset)()
    _, variables = init_model(cfg, jax.random.PRNGKey(0))

    flat_params = flatten(variables["params"])
    flat_bstats = flatten(variables.get("batch_stats", {}))
    sd = {}
    unmappable = []
    for path, arr in {**flat_params, **flat_bstats}.items():
        inv = inverse_key(path, arr)
        if inv is None:
            unmappable.append("/".join(path))
            continue
        sd[inv[0]] = inv[1]
    assert unmappable == [], f"paths with no inverse mapping: {unmappable}"

    params, batch_stats, unknown = convert_state_dict(sd)
    assert unknown == []
    missing, extra, mism = verify_against(
        {"params": params, "batch_stats": batch_stats}, variables
    )
    assert missing == [], missing
    assert extra == [], extra
    assert mism == [], mism

    conv_flat = flatten(params)
    for path, arr in flat_params.items():
        np.testing.assert_array_equal(
            conv_flat[path], arr, err_msg="/".join(path)
        )
