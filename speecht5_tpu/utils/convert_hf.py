"""HuggingFace ``transformers`` SpeechT5 checkpoint -> parameter pytree.

The released SpeechT5 checkpoints (``microsoft/speecht5_asr``,
``microsoft/speecht5_tts``, ``microsoft/speecht5_vc``, plus the HiFi-GAN
vocoder ``microsoft/speecht5_hifigan``) are distributed in the HF
``transformers`` namespace, which differs from the original fairseq `.pt`
layout handled by ``utils/convert.py``.  This module maps the HF namespace
(transformers ``modeling_speecht5.py``) onto our param tree so users can load
the actual released weights:

  speecht5.encoder.prenet.*            -> speech_encoder_prenet / text_encoder_prenet
  speecht5.encoder.wrapped_encoder.*   -> encoder (incl. embed_positions.pe_k)
  speecht5.decoder.prenet.*            -> text_decoder_prenet / speech_decoder_prenet
  speecht5.decoder.wrapped_decoder.*   -> decoder
  text_decoder_postnet.lm_head         -> text_decoder_postnet.output_projection
  speech_decoder_postnet.*             -> speech_decoder_postnet (+ batch_stats)

Tensor-layout conventions are the same as utils/convert.py (torch Linear
transposed, Conv1d [out,in,k] -> [k,in,out], weight-norm g/v pair for the conv
positional embedding — HF >= 4.30 stores these as
``parametrizations.weight.original{0,1}``; the legacy ``weight_g/weight_v``
names are also accepted).

Numeric parity of the full converted model against the torch implementation is
asserted by tests/test_hf_parity.py (ASR logits, TTS mel + stop logits).

Reference behavior spec: fairseq namespaces at reference models/speecht5.py
:1022-1058; the HF port is a faithful conversion of the same released weights,
so matching HF numerics == matching the released checkpoints.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from .convert import _t, _conv


def _alpha(x):
    return np.asarray(x, np.float32).reshape(1)


def _ln_name(wb: str) -> str:
    return "scale" if wb == "weight" else "bias"


def map_hf_key(key: str, feat_norm: str = "group"):
    """Map one HF state-dict key.  Returns (path_tuple, transform, collection)
    or None to skip (non-parameter buffers).  Unknown keys map to
    ``(("__unknown__",), None, None)``.

    ``feat_norm``: "group" (base arch: GroupNorm after conv 0 only) or
    "layer" (large arch: LayerNorm after every conv).
    """
    P = lambda *p: tuple(p)

    # sinusoidal position buffers (non-learned) and bookkeeping
    if key.endswith((".weights", "num_batches_tracked", ".position_ids")):
        return None

    # ---------------------------------------------------- speech encoder prenet
    pre = "speecht5.encoder.prenet."
    if key.startswith(pre):
        sub = key[len(pre):]
        if sub == "masked_spec_embed":
            return P("speech_encoder_prenet", "mask_emb"), None, "params"
        m = re.match(r"feature_encoder\.conv_layers\.(\d+)\.conv\.weight$", sub)
        if m:
            return (
                P("speech_encoder_prenet", "feature_extractor",
                  f"conv_{m.group(1)}", "kernel"),
                _conv, "params",
            )
        m = re.match(r"feature_encoder\.conv_layers\.(\d+)\.layer_norm\.(weight|bias)$", sub)
        if m:
            i, wb = m.groups()
            if feat_norm == "group":
                # base arch: the sole norm is a GroupNorm on conv 0
                return (
                    P("speech_encoder_prenet", "feature_extractor",
                      "group_norm", _ln_name(wb)),
                    None, "params",
                )
            return (
                P("speech_encoder_prenet", "feature_extractor",
                  f"ln_{i}", _ln_name(wb)),
                None, "params",
            )
        m = re.match(r"feature_projection\.layer_norm\.(weight|bias)$", sub)
        if m:
            return (
                P("speech_encoder_prenet", "layer_norm", _ln_name(m.group(1))),
                None, "params",
            )
        m = re.match(r"feature_projection\.projection\.(weight|bias)$", sub)
        if m:
            wb = m.group(1)
            return (
                P("speech_encoder_prenet", "post_extract_proj",
                  "kernel" if wb == "weight" else "bias"),
                _t if wb == "weight" else None, "params",
            )
        # weight-norm conv positional embedding.  HF parametrized naming:
        # original0 = g [1, 1, k], original1 = v [out, in/groups, k]
        if sub in (
            "pos_conv_embed.conv.parametrizations.weight.original0",
            "pos_conv_embed.conv.weight_g",
        ):
            return (
                P("speech_encoder_prenet", "pos_conv", "weight_g"),
                lambda x: np.ascontiguousarray(np.transpose(x, (2, 1, 0))),
                "params",
            )
        if sub in (
            "pos_conv_embed.conv.parametrizations.weight.original1",
            "pos_conv_embed.conv.weight_v",
        ):
            return P("speech_encoder_prenet", "pos_conv", "weight_v"), _conv, "params"
        if sub == "pos_conv_embed.conv.bias":
            return P("speech_encoder_prenet", "pos_conv", "bias"), None, "params"
        # ------------------------------------------------- text encoder prenet
        if sub == "embed_tokens.weight":
            return P("text_encoder_prenet", "embed_tokens", "embedding"), None, "params"
        if sub == "encode_positions.alpha":
            return P("text_encoder_prenet", "alpha"), _alpha, "params"
        return ("__unknown__",), None, None

    # ------------------------------------------------------- encoder transformer
    pre = "speecht5.encoder.wrapped_encoder."
    if key.startswith(pre):
        sub = key[len(pre):]
        m = re.match(r"layer_norm\.(weight|bias)$", sub)
        if m:
            return P("encoder", "layer_norm", _ln_name(m.group(1))), None, "params"
        if sub == "embed_positions.pe_k.weight":
            return P("encoder", "pos_emb", "pe_k", "embedding"), None, "params"
        m = re.match(r"layers\.(\d+)\.attention\.([qkv]_proj|out_proj)\.(weight|bias)$", sub)
        if m:
            i, proj, wb = m.groups()
            return (
                P("encoder", f"layers_{i}", "self_attn", proj,
                  "kernel" if wb == "weight" else "bias"),
                _t if wb == "weight" else None, "params",
            )
        m = re.match(r"layers\.(\d+)\.layer_norm\.(weight|bias)$", sub)
        if m:
            return (
                P("encoder", f"layers_{m.group(1)}", "self_attn_layer_norm",
                  _ln_name(m.group(2))),
                None, "params",
            )
        m = re.match(r"layers\.(\d+)\.final_layer_norm\.(weight|bias)$", sub)
        if m:
            return (
                P("encoder", f"layers_{m.group(1)}", "final_layer_norm",
                  _ln_name(m.group(2))),
                None, "params",
            )
        m = re.match(
            r"layers\.(\d+)\.feed_forward\.(intermediate_dense|output_dense)\.(weight|bias)$",
            sub,
        )
        if m:
            i, dense, wb = m.groups()
            fc = "fc1" if dense == "intermediate_dense" else "fc2"
            return (
                P("encoder", f"layers_{i}", "ffn", fc,
                  "kernel" if wb == "weight" else "bias"),
                _t if wb == "weight" else None, "params",
            )
        return ("__unknown__",), None, None

    # -------------------------------------------------------- decoder prenets
    pre = "speecht5.decoder.prenet."
    if key.startswith(pre):
        sub = key[len(pre):]
        if sub == "embed_tokens.weight":
            return P("text_decoder_prenet", "embed_tokens", "embedding"), None, "params"
        m = re.match(r"layers\.(\d+)\.(weight|bias)$", sub)
        if m:  # Tacotron prenet dense stack (TTS/VC decoder)
            i, wb = m.groups()
            return (
                P("speech_decoder_prenet", "prenet", f"layer_{i}",
                  "kernel" if wb == "weight" else "bias"),
                _t if wb == "weight" else None, "params",
            )
        m = re.match(r"final_layer\.(weight|bias)$", sub)
        if m:
            wb = m.group(1)
            return (
                P("speech_decoder_prenet", "proj",
                  "kernel" if wb == "weight" else "bias"),
                _t if wb == "weight" else None, "params",
            )
        if sub == "encode_positions.alpha":
            return P("speech_decoder_prenet", "alpha"), _alpha, "params"
        m = re.match(r"speaker_embeds_layer\.(weight|bias)$", sub)
        if m:
            wb = m.group(1)
            return (
                P("speech_decoder_prenet", "spkembs_layer",
                  "kernel" if wb == "weight" else "bias"),
                _t if wb == "weight" else None, "params",
            )
        return ("__unknown__",), None, None

    # ------------------------------------------------------ decoder transformer
    pre = "speecht5.decoder.wrapped_decoder."
    if key.startswith(pre):
        sub = key[len(pre):]
        m = re.match(
            r"layers\.(\d+)\.(self_attn|encoder_attn)\.([qkv]_proj|out_proj)\.(weight|bias)$",
            sub,
        )
        if m:
            i, attn, proj, wb = m.groups()
            return (
                P("decoder", f"layers_{i}", attn, proj,
                  "kernel" if wb == "weight" else "bias"),
                _t if wb == "weight" else None, "params",
            )
        m = re.match(
            r"layers\.(\d+)\.(self_attn_layer_norm|encoder_attn_layer_norm|final_layer_norm)\.(weight|bias)$",
            sub,
        )
        if m:
            i, ln, wb = m.groups()
            return P("decoder", f"layers_{i}", ln, _ln_name(wb)), None, "params"
        m = re.match(
            r"layers\.(\d+)\.feed_forward\.(intermediate_dense|output_dense)\.(weight|bias)$",
            sub,
        )
        if m:
            i, dense, wb = m.groups()
            fc = "fc1" if dense == "intermediate_dense" else "fc2"
            return (
                P("decoder", f"layers_{i}", "ffn", fc,
                  "kernel" if wb == "weight" else "bias"),
                _t if wb == "weight" else None, "params",
            )
        return ("__unknown__",), None, None

    # --------------------------------------------------------------- postnets
    if key == "text_decoder_postnet.lm_head.weight":
        return P("text_decoder_postnet", "output_projection", "kernel"), _t, "params"
    m = re.match(r"speech_decoder_postnet\.(feat_out|prob_out)\.(weight|bias)$", key)
    if m:
        layer, wb = m.groups()
        return (
            P("speech_decoder_postnet", layer,
              "kernel" if wb == "weight" else "bias"),
            _t if wb == "weight" else None, "params",
        )
    m = re.match(r"speech_decoder_postnet\.layers\.(\d+)\.conv\.weight$", key)
    if m:
        return (
            P("speech_decoder_postnet", "postnet", f"conv_{m.group(1)}", "kernel"),
            _conv, "params",
        )
    m = re.match(
        r"speech_decoder_postnet\.layers\.(\d+)\.batch_norm\.(weight|bias|running_mean|running_var)$",
        key,
    )
    if m:
        i, wb = m.groups()
        if wb in ("weight", "bias"):
            return (
                P("speech_decoder_postnet", "postnet", f"bn_{i}", _ln_name(wb)),
                None, "params",
            )
        name = "mean" if wb == "running_mean" else "var"
        return (
            P("speech_decoder_postnet", "postnet", f"bn_{i}", name),
            None, "batch_stats",
        )

    return ("__unknown__",), None, None


def convert_hf_state_dict(state_dict: Dict[str, np.ndarray]):
    """HF torch state_dict (numpy values) -> (params, batch_stats, unknown).

    The conv-feature norm mode is detected from the keys: a ``layer_norm`` on
    conv layer >= 1 means the "layer" (large) arch, else "group" (base).
    """
    feat_norm = "group"
    for k in state_dict:
        if re.search(r"feature_encoder\.conv_layers\.[1-9]\d*\.layer_norm\.", k):
            feat_norm = "layer"
            break

    params: dict = {}
    batch_stats: dict = {}
    unknown = []
    for key, val in state_dict.items():
        mapped = map_hf_key(key, feat_norm)
        if mapped is None:
            continue
        path, tr, coll = mapped
        if coll is None:
            unknown.append(key)
            continue
        arr = np.asarray(val, dtype=np.float32)
        if tr is not None:
            arr = tr(arr)
        tree = params if coll == "params" else batch_stats
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return params, batch_stats, unknown


def hf_config_to_ours(hf_cfg, dtype: str = "float32"):
    """transformers.SpeechT5Config -> our SpeechT5Config (matching dims).

    The HF port implements exactly the released base arch: post-LN stacks,
    encoder-only relative position bias with no per-layer table LN, no decoder
    rel-pos table, standard GELU.
    """
    from ..config import (
        SpeechT5Config, TransformerConfig, RelPosConfig, ConvFeatureConfig,
        SpeechDecoderPrenetConfig, SpeechDecoderPostnetConfig, MaskingConfig,
    )

    conv_layers = tuple(
        (d, k, s)
        for d, k, s in zip(hf_cfg.conv_dim, hf_cfg.conv_kernel, hf_cfg.conv_stride)
    )
    enc = TransformerConfig(
        d_model=hf_cfg.hidden_size,
        ffn_dim=hf_cfg.encoder_ffn_dim,
        num_layers=hf_cfg.encoder_layers,
        num_heads=hf_cfg.encoder_attention_heads,
        dropout=hf_cfg.hidden_dropout,
        attention_dropout=hf_cfg.attention_dropout,
        activation_dropout=hf_cfg.activation_dropout,
        activation=hf_cfg.hidden_act,
        layer_norm_first=False,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        layerdrop=hf_cfg.encoder_layerdrop,
        rel_pos=RelPosConfig(
            enabled=True, max_distance=hf_cfg.encoder_max_relative_position
        ),
    )
    dec = TransformerConfig(
        d_model=hf_cfg.hidden_size,
        ffn_dim=hf_cfg.decoder_ffn_dim,
        num_layers=hf_cfg.decoder_layers,
        num_heads=hf_cfg.decoder_attention_heads,
        dropout=hf_cfg.hidden_dropout,
        attention_dropout=hf_cfg.attention_dropout,
        activation_dropout=hf_cfg.activation_dropout,
        activation=hf_cfg.hidden_act,
        layer_norm_first=False,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        layerdrop=hf_cfg.decoder_layerdrop,
        rel_pos=RelPosConfig(enabled=False),
        use_rel_pos_bias=False,
    )
    return SpeechT5Config(
        vocab_size=hf_cfg.vocab_size,
        pad_id=hf_cfg.pad_token_id,
        bos_id=hf_cfg.bos_token_id,
        eos_id=hf_cfg.eos_token_id,
        encoder=enc,
        decoder=dec,
        conv_features=ConvFeatureConfig(
            layers=conv_layers,
            mode="default" if hf_cfg.feat_extract_norm == "group" else "layer_norm",
            bias=hf_cfg.conv_bias,
        ),
        masking=MaskingConfig(
            mask_prob=hf_cfg.mask_time_prob, mask_length=hf_cfg.mask_time_length,
            mask_channel_prob=hf_cfg.mask_feature_prob,
            mask_channel_length=hf_cfg.mask_feature_length,
        ),
        max_speech_positions=hf_cfg.max_speech_positions,
        max_text_positions=hf_cfg.max_text_positions,
        conv_pos=hf_cfg.num_conv_pos_embeddings,
        conv_pos_groups=hf_cfg.num_conv_pos_embedding_groups,
        n_mels=hf_cfg.num_mel_bins,
        reduction_factor=hf_cfg.reduction_factor,
        speech_prenet=SpeechDecoderPrenetConfig(
            layers=hf_cfg.speech_decoder_prenet_layers,
            units=hf_cfg.speech_decoder_prenet_units,
            dropout=hf_cfg.speech_decoder_prenet_dropout,
        ),
        speech_postnet=SpeechDecoderPostnetConfig(
            postnet_layers=hf_cfg.speech_decoder_postnet_layers,
            postnet_chans=hf_cfg.speech_decoder_postnet_units,
            postnet_filts=hf_cfg.speech_decoder_postnet_kernel,
            postnet_dropout=hf_cfg.speech_decoder_postnet_dropout,
        ),
        spk_embed_dim=hf_cfg.speaker_embedding_dim,
        dtype=dtype,
    )


def load_hf_checkpoint(model_or_path, dtype: str = "float32"):
    """Load an HF SpeechT5 model (a ``PreTrainedModel`` instance or a local
    path / model id resolvable by ``from_pretrained``) and convert.

    Returns (our SpeechT5Config, variables dict, unknown keys).
    """
    import torch

    if isinstance(model_or_path, str):
        from transformers import AutoModel

        model = AutoModel.from_pretrained(model_or_path)
    else:
        model = model_or_path
    with torch.no_grad():
        sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    params, batch_stats, unknown = convert_hf_state_dict(sd)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    cfg = hf_config_to_ours(model.config, dtype=dtype)
    return cfg, variables, unknown


# ------------------------------------------------------------------ EnCodec


def convert_encodec(state_dict: Dict[str, np.ndarray], cfg) -> dict:
    """transformers.EncodecModel state_dict -> models/encodec.py variables.

    Weight-norm parametrizations stay split (original0 -> weight_g,
    original1 -> weight_v); layouts move to flax [k, in, out] kernels.
    ``cfg`` is our models.encodec.EncodecConfig and must match the HF
    topology (the parity test constructs both from the same numbers).
    """
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()}

    def conv(prefix):
        """HF EncodecConv1d -> {weight_v, weight_g, bias}."""
        v = sd[f"{prefix}.conv.parametrizations.weight.original1"]
        g = sd[f"{prefix}.conv.parametrizations.weight.original0"]
        return {
            "weight_v": v.transpose(2, 1, 0),        # (out,in,k)->(k,in,out)
            "weight_g": g.reshape(-1),
            "bias": sd[f"{prefix}.conv.bias"],
        }

    def convt(prefix):
        """HF EncodecConvTranspose1d (in,out,k) -> flax [k, in, out]."""
        v = sd[f"{prefix}.conv.parametrizations.weight.original1"]
        g = sd[f"{prefix}.conv.parametrizations.weight.original0"]
        return {
            "weight_v": v.transpose(2, 0, 1),
            "weight_g": g.reshape(-1),
            "bias": sd[f"{prefix}.conv.bias"],
        }

    def lstm(prefix, num_layers):
        out = {}
        for l in range(num_layers):
            for nm in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                out[f"{nm}_l{l}"] = sd[f"{prefix}.lstm.{nm}_l{l}"]
        return out

    def resblock(prefix):
        return {
            "block_conv1": conv(f"{prefix}.block.1"),
            "block_conv2": conv(f"{prefix}.block.3"),
            "shortcut": conv(f"{prefix}.shortcut"),
        }

    n_res = cfg.num_residual_layers

    # decoder layer indices mirror the HF constructor's sequential list
    dec = {}
    idx = 0
    dec["conv_in"] = conv(f"decoder.layers.{idx}")
    idx += 1
    dec["lstm"] = lstm(f"decoder.layers.{idx}", cfg.num_lstm_layers)
    idx += 1
    for i, _ratio in enumerate(cfg.upsampling_ratios):
        idx += 1                                     # ELU
        dec[f"up{i}"] = convt(f"decoder.layers.{idx}")
        idx += 1
        for j in range(n_res):
            dec[f"res{i}_{j}"] = resblock(f"decoder.layers.{idx}")
            idx += 1
    idx += 1                                         # ELU
    dec["conv_out"] = conv(f"decoder.layers.{idx}")

    enc = {}
    idx = 0
    enc["conv_in"] = conv(f"encoder.layers.{idx}")
    idx += 1
    for i, _ratio in enumerate(reversed(cfg.upsampling_ratios)):
        for j in range(n_res):
            enc[f"res{i}_{j}"] = resblock(f"encoder.layers.{idx}")
            idx += 1
        idx += 1                                     # ELU
        enc[f"down{i}"] = conv(f"encoder.layers.{idx}")
        idx += 1
    enc["lstm"] = lstm(f"encoder.layers.{idx}", cfg.num_lstm_layers)
    idx += 2                                         # lstm + ELU
    enc["conv_out"] = conv(f"encoder.layers.{idx}")

    embed = np.stack([
        sd[f"quantizer.layers.{q}.codebook.embed"]
        for q in range(cfg.num_quantizers)
    ])
    return {"params": {
        "decoder": dec, "encoder": enc, "quantizer": {"embed": embed},
    }}
