"""Numeric parity of WavLLM's pretrained components against HF transformers.

The WavLLM reference consumes three released pretrained models
(reference WavLLM/wavllm/models/speechllm_model.py:183-278): a Whisper
encoder, a WavLM encoder and a LLaMA decoder, all distributed in HF
transformers format.  Randomly-initialized torch models at tiny widths are
exact oracles for the converters in utils/convert_components.py: if the
converted state dicts reproduce torch numerics here, the real released
weights load correctly (same code path, same layouts).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from speecht5_tpu.models.wavlm import WavLMEncoderModel
from speecht5_tpu.models.wavllm import WavLLMConfig, WhisperStyleEncoder, wavllm_tiny
from speecht5_tpu.utils.convert_components import (
    convert_llama_state_dict,
    convert_wavlm_state_dict,
    convert_whisper_encoder_state_dict,
    wavlm_config_from_hf,
)

ATOL = 2e-4


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def flat_keys(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= flat_keys(v, prefix + (k,))
        else:
            out.add("/".join(prefix + (k,)))
    return out


def assert_same_structure(converted, initialized, ignore=()):
    got = flat_keys(converted)
    want = {k for k in flat_keys(initialized)
            if not any(s in k for s in ignore)}
    assert got == want, (
        f"missing={sorted(want - got)} extra={sorted(got - want)}"
    )


# ------------------------------------------------------------------- WavLM


def tiny_wavlm_hf(**kw):
    from transformers import WavLMConfig as HFWavLMConfig

    base = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=48,
        conv_dim=(16, 16, 16),
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_buckets=16,
        max_bucket_distance=40,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        conv_bias=False,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    base.update(kw)
    return HFWavLMConfig(**base)


@pytest.mark.parametrize(
    "variant_kw, atol",
    [
        ({}, ATOL),  # base topology: group feat-norm, post-LN
        (    # large topology: per-layer conv LN, pre-LN, conv bias.
             # pre-LN accumulates slightly more fp32 noise (residual stream
             # never re-normalized until the end); a layout/ordering bug
             # would produce O(1) errors, not 5e-4.
            {
                "feat_extract_norm": "layer",
                "do_stable_layer_norm": True,
                "conv_bias": True,
            },
            6e-4,
        ),
    ],
    ids=["base", "large"],
)
def test_wavlm_encoder_parity(variant_kw, atol):
    from transformers import WavLMModel as HFWavLMModel

    torch.manual_seed(0)
    hf = HFWavLMModel(tiny_wavlm_hf(**variant_kw)).eval()
    params, unknown = convert_wavlm_state_dict(sd_numpy(hf))
    assert unknown == [], unknown

    cfg = wavlm_config_from_hf(hf.config)
    model = WavLMEncoderModel(cfg)

    rng = np.random.default_rng(0)
    B, T = 2, 1000
    wav = rng.standard_normal((B, T)).astype(np.float32) * 0.1
    lengths = np.asarray([T, 640], np.int32)

    init = model.init(jax.random.PRNGKey(0), jnp.asarray(wav),
                      jnp.asarray(lengths))
    assert_same_structure(params, init["params"])

    ours, valid = model.apply({"params": params}, jnp.asarray(wav),
                              jnp.asarray(lengths))

    attn_mask = torch.arange(T)[None, :] < torch.as_tensor(lengths)[:, None]
    with torch.no_grad():
        theirs = hf(
            torch.as_tensor(wav), attention_mask=attn_mask.long()
        ).last_hidden_state.numpy()

    ours = np.asarray(ours)
    valid = np.asarray(valid)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours[valid], theirs[valid], atol=atol)


# ----------------------------------------------------------------- Whisper


def test_whisper_encoder_parity():
    from transformers import WhisperConfig, WhisperModel

    torch.manual_seed(0)
    hf_cfg = WhisperConfig(
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=48,
        decoder_layers=1,
        decoder_attention_heads=4,
        decoder_ffn_dim=48,
        num_mel_bins=20,
        max_source_positions=32,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
    )
    hf = WhisperModel(hf_cfg).get_encoder().eval()
    params, unknown = convert_whisper_encoder_state_dict(sd_numpy(hf))
    assert unknown == [], unknown

    cfg = wavllm_tiny(
        n_mels=20, whisper_d=32, whisper_layers=2, whisper_heads=4,
        whisper_ffn=48, max_source_positions=32,
    )
    enc = WhisperStyleEncoder(cfg)

    rng = np.random.default_rng(1)
    B, T = 2, 64  # HF whisper requires T == max_source_positions * 2
    mel = rng.standard_normal((B, T, 20)).astype(np.float32)
    lengths = jnp.asarray([T, T], jnp.int32)

    init = enc.init(jax.random.PRNGKey(0), jnp.asarray(mel), lengths)
    assert_same_structure(params, init["params"])

    ours, out_lengths = enc.apply({"params": params}, jnp.asarray(mel), lengths)
    with torch.no_grad():
        theirs = hf(
            torch.as_tensor(np.transpose(mel, (0, 2, 1)))
        ).last_hidden_state.numpy()

    assert int(out_lengths[0]) == theirs.shape[1]
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL)


# ------------------------------------------------------------------- LLaMA


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict):
            _merge(dst[k], v)
        else:
            assert np.shape(dst[k]) == np.shape(v), (k, dst[k].shape, v.shape)
            dst[k] = jnp.asarray(v)


def test_llama_decoder_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    from speecht5_tpu.models.wavllm import WavLLMModel

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=48,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        intermediate_size=64,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    params, unknown = convert_llama_state_dict(sd_numpy(hf), num_heads=4)
    assert unknown == [], unknown

    cfg = wavllm_tiny()  # llama dims already match hf_cfg above
    model = WavLLMModel(cfg)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((2, 24, cfg.n_mels)), jnp.float32)
    ml = jnp.asarray([24, 24])
    prompt = jnp.asarray([[5, 6], [5, 6]])
    target = jnp.asarray([[9, 2], [9, 2]])
    variables = model.init(
        jax.random.PRNGKey(0), mel, ml, prompt, target, method="forward_sft"
    )
    merged = jax.tree_util.tree_map(lambda x: x, variables["params"])  # copy
    _merge(merged, params)

    tokens = np.asarray([[1, 5, 9, 13, 2], [1, 7, 11, 3, 2]], np.int64)

    def lm_logits(mdl, toks):
        emb = mdl.tok_embeddings(toks).astype(mdl.cfg.compute_dtype)
        positions = jnp.broadcast_to(
            jnp.arange(toks.shape[1])[None], toks.shape
        )
        logits, _ = mdl._llama(emb, positions)
        return logits

    ours = model.apply(
        {"params": merged}, jnp.asarray(tokens), method=lm_logits
    )
    with torch.no_grad():
        theirs = hf(torch.as_tensor(tokens)).logits.numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL)
