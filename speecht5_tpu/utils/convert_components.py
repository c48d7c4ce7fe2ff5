"""HF checkpoint converters for WavLLM's pretrained components.

The WavLLM reference builds on three released pretrained models
(reference WavLLM/wavllm/models/speechllm_model.py:183-278): a Whisper
encoder, a WavLM encoder and a LLaMA decoder.  These converters map the HF
``transformers`` state dicts of those models onto our modules so the actual
released weights load:

  WavLMModel        -> models/wavlm.py:WavLMEncoderModel
  WhisperModel (enc)-> models/wavllm.py:WhisperStyleEncoder
  LlamaModel        -> models/wavllm.py LLaMA decoder params

Numeric parity of each converted component against its torch implementation
is asserted by tests/test_wavllm_hf.py.  Layout conventions follow
utils/convert.py (Linear transposed, Conv1d [out,in,k] -> [k,in,out],
weight-norm g/v pairs, legacy and parametrized torch namings).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from .convert import _t, _conv


def _put(tree, path, val):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(val, np.float32)


def _ln(wb):
    return "scale" if wb == "weight" else "bias"


# ------------------------------------------------------------------- WavLM


def convert_wavlm_state_dict(sd: Dict[str, np.ndarray]):
    """HF WavLMModel state dict -> (params for WavLMEncoderModel, unknown)."""
    feat_norm = "group"
    for k in sd:
        if re.search(r"feature_extractor\.conv_layers\.[1-9]\d*\.layer_norm\.", k):
            feat_norm = "layer"
            break

    params: dict = {}
    unknown = []
    for key, val in sd.items():
        if key.endswith(("num_batches_tracked", ".position_ids")):
            continue
        if key == "masked_spec_embed":
            continue  # pretrain-time masking vector; encoder here is a frontend
        m = re.match(r"feature_extractor\.conv_layers\.(\d+)\.conv\.(weight|bias)$", key)
        if m:
            i, wb = m.groups()
            if wb == "weight":
                _put(params, ("feature_extractor", f"conv_{i}", "kernel"),
                     _conv(val))
            else:
                _put(params, ("feature_extractor", f"conv_{i}", "bias"), val)
            continue
        m = re.match(r"feature_extractor\.conv_layers\.(\d+)\.layer_norm\.(weight|bias)$", key)
        if m:
            i, wb = m.groups()
            dst = ("group_norm",) if feat_norm == "group" else (f"ln_{i}",)
            _put(params, ("feature_extractor",) + dst + (_ln(wb),), val)
            continue
        m = re.match(r"feature_projection\.layer_norm\.(weight|bias)$", key)
        if m:
            _put(params, ("fp_layer_norm", _ln(m.group(1))), val)
            continue
        m = re.match(r"feature_projection\.projection\.(weight|bias)$", key)
        if m:
            wb = m.group(1)
            _put(params, ("fp_projection", "kernel" if wb == "weight" else "bias"),
                 _t(val) if wb == "weight" else val)
            continue
        if key in (
            "encoder.pos_conv_embed.conv.parametrizations.weight.original0",
            "encoder.pos_conv_embed.conv.weight_g",
        ):
            _put(params, ("pos_conv", "weight_g"),
                 np.ascontiguousarray(np.transpose(val, (2, 1, 0))))
            continue
        if key in (
            "encoder.pos_conv_embed.conv.parametrizations.weight.original1",
            "encoder.pos_conv_embed.conv.weight_v",
        ):
            _put(params, ("pos_conv", "weight_v"), _conv(val))
            continue
        if key == "encoder.pos_conv_embed.conv.bias":
            _put(params, ("pos_conv", "bias"), val)
            continue
        m = re.match(r"encoder\.layer_norm\.(weight|bias)$", key)
        if m:
            _put(params, ("encoder_layer_norm", _ln(m.group(1))), val)
            continue
        m = re.match(
            r"encoder\.layers\.(\d+)\.attention\.([qkv]_proj|out_proj|gru_rel_pos_linear)\.(weight|bias)$",
            key,
        )
        if m:
            i, proj, wb = m.groups()
            _put(params,
                 (f"layers_{i}", "attention", proj,
                  "kernel" if wb == "weight" else "bias"),
                 _t(val) if wb == "weight" else val)
            continue
        m = re.match(r"encoder\.layers\.(\d+)\.attention\.gru_rel_pos_const$", key)
        if m:
            _put(params, (f"layers_{m.group(1)}", "attention",
                          "gru_rel_pos_const"), val)
            continue
        m = re.match(r"encoder\.layers\.(\d+)\.attention\.rel_attn_embed\.weight$", key)
        if m:
            _put(params, (f"layers_{m.group(1)}", "attention",
                          "rel_attn_embed"), val)
            continue
        m = re.match(r"encoder\.layers\.(\d+)\.(layer_norm|final_layer_norm)\.(weight|bias)$", key)
        if m:
            i, ln, wb = m.groups()
            _put(params, (f"layers_{i}", ln, _ln(wb)), val)
            continue
        m = re.match(
            r"encoder\.layers\.(\d+)\.feed_forward\.(intermediate_dense|output_dense)\.(weight|bias)$",
            key,
        )
        if m:
            i, dense, wb = m.groups()
            _put(params,
                 (f"layers_{i}", "feed_forward", dense,
                  "kernel" if wb == "weight" else "bias"),
                 _t(val) if wb == "weight" else val)
            continue
        unknown.append(key)
    return params, unknown


def wavlm_config_from_hf(hf_cfg, dtype: str = "float32"):
    from ..models.wavlm import WavLMConfig
    from ..config import ConvFeatureConfig

    conv_layers = tuple(
        (d, k, s)
        for d, k, s in zip(hf_cfg.conv_dim, hf_cfg.conv_kernel, hf_cfg.conv_stride)
    )
    return WavLMConfig(
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        ffn_dim=hf_cfg.intermediate_size,
        conv=ConvFeatureConfig(
            layers=conv_layers,
            mode="default" if hf_cfg.feat_extract_norm == "group" else "layer_norm",
            bias=hf_cfg.conv_bias,
        ),
        num_buckets=hf_cfg.num_buckets,
        max_bucket_distance=hf_cfg.max_bucket_distance,
        stable_layer_norm=hf_cfg.do_stable_layer_norm,
        conv_pos=hf_cfg.num_conv_pos_embeddings,
        conv_pos_groups=hf_cfg.num_conv_pos_embedding_groups,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        dropout=hf_cfg.hidden_dropout,
        attention_dropout=hf_cfg.attention_dropout,
        activation_dropout=hf_cfg.activation_dropout,
        dtype=dtype,
    )


# ----------------------------------------------------------------- Whisper


def convert_whisper_encoder_state_dict(sd: Dict[str, np.ndarray]):
    """HF WhisperModel (or WhisperEncoder) state dict -> params for
    WhisperStyleEncoder.  Accepts keys with or without the ``encoder.`` /
    ``model.encoder.`` prefixes; decoder keys are ignored (WavLLM uses the
    encoder only, reference speechllm_model.py:188)."""
    params: dict = {}
    unknown = []
    for key, val in sd.items():
        k = key
        for pre in ("model.encoder.", "encoder.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        if key.startswith(("model.decoder.", "decoder.")) or k.startswith("decoder."):
            continue
        if k in ("conv1.weight", "conv2.weight"):
            _put(params, (k.split(".")[0], "kernel"), _conv(val))
            continue
        if k in ("conv1.bias", "conv2.bias"):
            _put(params, (k.split(".")[0], "bias"), val)
            continue
        if k == "embed_positions.weight":
            _put(params, ("embed_positions",), val)
            continue
        m = re.match(r"layer_norm\.(weight|bias)$", k)
        if m:
            _put(params, ("layer_norm", _ln(m.group(1))), val)
            continue
        m = re.match(
            r"layers\.(\d+)\.self_attn\.([qkv]_proj|out_proj)\.(weight|bias)$", k
        )
        if m:
            i, proj, wb = m.groups()
            _put(params,
                 (f"layers_{i}", "self_attn", proj,
                  "kernel" if wb == "weight" else "bias"),
                 _t(val) if wb == "weight" else val)
            continue
        m = re.match(
            r"layers\.(\d+)\.(self_attn_layer_norm|final_layer_norm)\.(weight|bias)$",
            k,
        )
        if m:
            i, ln, wb = m.groups()
            _put(params, (f"layers_{i}", ln, _ln(wb)), val)
            continue
        m = re.match(r"layers\.(\d+)\.(fc1|fc2)\.(weight|bias)$", k)
        if m:
            i, fc, wb = m.groups()
            _put(params,
                 (f"layers_{i}", "ffn", fc,
                  "kernel" if wb == "weight" else "bias"),
                 _t(val) if wb == "weight" else val)
            continue
        unknown.append(key)
    # whisper k_proj has no bias; ours does — zero-fill for exact parity
    for name, layer in params.items():
        if name.startswith("layers_") and "self_attn" in layer:
            kp = layer["self_attn"].get("k_proj", {})
            if "kernel" in kp and "bias" not in kp:
                kp["bias"] = np.zeros(kp["kernel"].shape[1], np.float32)
    return params, unknown


# ------------------------------------------------------------------- LLaMA


def _unpermute_rope(w_t, num_heads):
    """HF LLaMA checkpoints store q/k projections permuted for the
    rotate-half RoPE; our apply_rope uses the original interleaved-pair
    convention.  Un-permute the flax kernel's OUTPUT columns so
    interleaved RoPE over the converted weights reproduces HF numerics:
    ours[:, h, 2i] = hf[:, h, i]; ours[:, h, 2i+1] = hf[:, h, Dh/2 + i].
    """
    d_in, d_out = w_t.shape
    dh = d_out // num_heads
    w = w_t.reshape(d_in, num_heads, dh)
    half = dh // 2
    out = np.empty_like(w)
    out[:, :, 0::2] = w[:, :, :half]
    out[:, :, 1::2] = w[:, :, half:]
    return out.reshape(d_in, d_out)


def convert_llama_state_dict(sd: Dict[str, np.ndarray], num_heads: int):
    """HF LlamaModel / LlamaForCausalLM state dict -> params for the WavLLM
    LLaMA decoder (wq/wk/wv/wo LoRALinear base kernels, w1/w2/w3 MLP,
    attention_norm/ffn_norm RMSNorms, tok embedding, final norm, lm head).
    """
    params: dict = {}
    unknown = []
    name_map = {
        "q_proj": ("wq", True), "k_proj": ("wk", True),
        "v_proj": ("wv", False), "o_proj": ("wo", False),
        "gate_proj": ("w1", False), "up_proj": ("w3", False),
        "down_proj": ("w2", False),
    }
    for key, val in sd.items():
        k = key
        if k.startswith("model."):
            k = k[len("model."):]
        if k.endswith("rotary_emb.inv_freq") or k.endswith(".position_ids"):
            continue
        if k == "embed_tokens.weight":
            _put(params, ("tok_embeddings", "embedding"), val)
            continue
        if k == "norm.weight":
            _put(params, ("norm", "weight"), val)
            continue
        if k == "lm_head.weight":
            _put(params, ("output", "kernel"), _t(val))
            continue
        m = re.match(r"layers\.(\d+)\.self_attn\.([qkvo]_proj)\.weight$", k)
        if m:
            i, proj = m.groups()
            ours, permuted = name_map[proj]
            w = _t(val)
            if permuted:
                w = _unpermute_rope(w, num_heads)
            _put(params, (f"llama_layers_{i}", ours, "kernel"), w)
            continue
        m = re.match(r"layers\.(\d+)\.mlp\.(gate_proj|up_proj|down_proj)\.weight$", k)
        if m:
            i, proj = m.groups()
            ours, _ = name_map[proj]
            _put(params, (f"llama_layers_{i}", ours, "kernel"), _t(val))
            continue
        m = re.match(r"layers\.(\d+)\.(input_layernorm|post_attention_layernorm)\.weight$", k)
        if m:
            i, ln = m.groups()
            ours = "attention_norm" if ln == "input_layernorm" else "ffn_norm"
            _put(params, (f"llama_layers_{i}", ours, "weight"), val)
            continue
        unknown.append(key)
    return params, unknown
