"""fairseq .pt checkpoint -> parameter pytree converter.

Maps the reference's state-dict namespaces (reference models/speecht5.py:1022-1058,
SURVEY.md section 3.5) onto this framework's param tree.  Conventions translated:

- torch Linear weight [out, in]    -> flax Dense kernel [in, out] (transpose)
- torch Conv1d weight [out, in, k] -> flax conv kernel [k, in, out]
- torch Embedding weight           -> flax Embed embedding (as-is)
- torch LayerNorm weight/bias      -> flax scale/bias
- weight-norm conv (pos_conv, dim=2): weight_g [1,1,k] -> [k,1,1], weight_v
  [out, in/g, k] -> [k, in/g, out]
- BatchNorm running stats -> the 'batch_stats' collection

Unknown keys are reported, never silently dropped; shape mismatches raise.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _t(x):  # torch Linear -> Dense
    return np.ascontiguousarray(np.transpose(x))


def _conv(x):  # [out, in, k] -> [k, in, out]
    return np.ascontiguousarray(np.transpose(x, (2, 1, 0)))


def map_speecht5_key(key: str):
    """Returns (path_tuple, transform, collection) or None to skip."""
    P = lambda *p: tuple(p)

    # buffers to skip
    if key.endswith(("._float_tensor", ".version", "num_updates")):
        return None

    # ---- speech encoder prenet ----
    m = re.match(r"speech_encoder_prenet\.feature_extractor\.conv_layers\.(\d+)\.0\.(weight|bias)$", key)
    if m:
        i, wb = m.group(1), m.group(2)
        name = "kernel" if wb == "weight" else "bias"
        tr = _conv if wb == "weight" else None
        return P("speech_encoder_prenet", "feature_extractor", f"conv_{i}", name), tr, "params"
    m = re.match(r"speech_encoder_prenet\.feature_extractor\.conv_layers\.0\.2\.(weight|bias)$", key)
    if m:  # Fp32GroupNorm on first block ("default" mode)
        name = "scale" if m.group(1) == "weight" else "bias"
        return P("speech_encoder_prenet", "feature_extractor", "group_norm", name), None, "params"
    m = re.match(r"speech_encoder_prenet\.feature_extractor\.conv_layers\.(\d+)\.2\.1\.(weight|bias)$", key)
    if m:  # per-layer LN ("layer_norm" mode)
        name = "scale" if m.group(2) == "weight" else "bias"
        return P("speech_encoder_prenet", "feature_extractor", f"ln_{m.group(1)}", name), None, "params"
    m = re.match(r"speech_encoder_prenet\.layer_norm\.(weight|bias)$", key)
    if m:
        name = "scale" if m.group(1) == "weight" else "bias"
        return P("speech_encoder_prenet", "layer_norm", name), None, "params"
    m = re.match(r"speech_encoder_prenet\.post_extract_proj\.(weight|bias)$", key)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        tr = _t if m.group(1) == "weight" else None
        return P("speech_encoder_prenet", "post_extract_proj", name), tr, "params"
    if key == "speech_encoder_prenet.mask_emb":
        return P("speech_encoder_prenet", "mask_emb"), None, "params"
    m = re.match(r"speech_encoder_prenet\.pos_conv\.0\.(weight_g|weight_v|bias)$", key)
    if m:
        wb = m.group(1)
        if wb == "weight_g":
            return P("speech_encoder_prenet", "pos_conv", "weight_g"), (
                lambda x: np.ascontiguousarray(np.transpose(x, (2, 1, 0)))
            ), "params"
        if wb == "weight_v":
            return P("speech_encoder_prenet", "pos_conv", "weight_v"), _conv, "params"
        return P("speech_encoder_prenet", "pos_conv", "bias"), None, "params"

    # ---- text encoder prenet ----
    if key == "text_encoder_prenet.encoder_prenet.0.weight":
        return P("text_encoder_prenet", "embed_tokens", "embedding"), None, "params"
    if key == "text_encoder_prenet.encoder_prenet.1.alpha":
        return P("text_encoder_prenet", "alpha"), (lambda x: x.reshape(1)), "params"

    # ---- encoder / decoder transformer stacks ----
    m = re.match(
        r"(encoder|decoder)\.layers\.(\d+)\.(self_attn|encoder_attn)\.([qkv]_proj|out_proj)\.(weight|bias)$",
        key,
    )
    if m:
        stack, i, attn, proj, wb = m.groups()
        name = "kernel" if wb == "weight" else "bias"
        tr = _t if wb == "weight" else None
        return P(stack, f"layers_{i}", attn, proj, name), tr, "params"
    m = re.match(
        r"(encoder|decoder)\.layers\.(\d+)\.(self_attn_layer_norm|encoder_attn_layer_norm|final_layer_norm|norm_k)\.(weight|bias)$",
        key,
    )
    if m:
        stack, i, ln, wb = m.groups()
        name = "scale" if wb == "weight" else "bias"
        return P(stack, f"layers_{i}", ln, name), None, "params"
    m = re.match(r"(encoder|decoder)\.layers\.(\d+)\.(fc1|fc2)\.(weight|bias)$", key)
    if m:
        stack, i, fc, wb = m.groups()
        name = "kernel" if wb == "weight" else "bias"
        tr = _t if wb == "weight" else None
        return P(stack, f"layers_{i}", "ffn", fc, name), tr, "params"
    m = re.match(r"(encoder|decoder)\.layer_norm\.(weight|bias)$", key)
    if m:
        name = "scale" if m.group(2) == "weight" else "bias"
        return P(m.group(1), "layer_norm", name), None, "params"
    m = re.match(r"(encoder|decoder)\.pos_emb\.pe_k\.weight$", key)
    if m:
        return P(m.group(1), "pos_emb", "pe_k", "embedding"), None, "params"
    m = re.match(r"encoder\.proj\.(weight|bias)$", key)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        tr = _t if m.group(1) == "weight" else None
        return P("encoder", "proj", name), tr, "params"

    # ---- text decoder pre/post ----
    if key == "text_decoder_prenet.embed_tokens.weight":
        return P("text_decoder_prenet", "embed_tokens", "embedding"), None, "params"
    m = re.match(r"text_decoder_prenet\.layernorm_embedding\.(weight|bias)$", key)
    if m:
        name = "scale" if m.group(1) == "weight" else "bias"
        return P("text_decoder_prenet", "layernorm_embedding", name), None, "params"
    if key == "text_decoder_postnet.output_projection.weight":
        return P("text_decoder_postnet", "output_projection", "kernel"), _t, "params"

    # ---- speech decoder prenet ----
    m = re.match(r"speech_decoder_prenet\.decoder_prenet\.0\.0\.prenet\.(\d+)\.0\.(weight|bias)$", key)
    if m:
        i, wb = m.groups()
        name = "kernel" if wb == "weight" else "bias"
        tr = _t if wb == "weight" else None
        return P("speech_decoder_prenet", "prenet", f"layer_{i}", name), tr, "params"
    m = re.match(r"speech_decoder_prenet\.decoder_prenet\.0\.1\.(weight|bias)$", key)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        tr = _t if m.group(1) == "weight" else None
        return P("speech_decoder_prenet", "proj", name), tr, "params"
    if key == "speech_decoder_prenet.decoder_prenet.1.alpha":
        return P("speech_decoder_prenet", "alpha"), (lambda x: x.reshape(1)), "params"
    m = re.match(r"speech_decoder_prenet\.spkembs_layer\.0\.(weight|bias)$", key)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        tr = _t if m.group(1) == "weight" else None
        return P("speech_decoder_prenet", "spkembs_layer", name), tr, "params"

    # ---- speech decoder postnet ----
    m = re.match(r"speech_decoder_postnet\.(feat_out|prob_out)\.(weight|bias)$", key)
    if m:
        layer, wb = m.groups()
        name = "kernel" if wb == "weight" else "bias"
        tr = _t if wb == "weight" else None
        return P("speech_decoder_postnet", layer, name), tr, "params"
    m = re.match(r"speech_decoder_postnet\.postnet\.postnet\.(\d+)\.0\.weight$", key)
    if m:
        return P("speech_decoder_postnet", "postnet", f"conv_{m.group(1)}", "kernel"), _conv, "params"
    m = re.match(r"speech_decoder_postnet\.postnet\.postnet\.(\d+)\.1\.(weight|bias|running_mean|running_var)$", key)
    if m:
        i, wb = m.groups()
        if wb in ("weight", "bias"):
            name = "scale" if wb == "weight" else "bias"
            return P("speech_decoder_postnet", "postnet", f"bn_{i}", name), None, "params"
        name = "mean" if wb == "running_mean" else "var"
        return P("speech_decoder_postnet", "postnet", f"bn_{i}", name), None, "batch_stats"
    if re.match(r"speech_decoder_postnet\.postnet\.postnet\.\d+\.1\.num_batches_tracked$", key):
        return None

    # ---- hubert head ----
    if key == "hubert_layer.label_embs_concat":
        return P("speech_encoder_postnet", "label_embs_concat"), None, "params"
    m = re.match(r"hubert_layer\.final_proj\.(weight|bias)$", key)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        tr = _t if m.group(1) == "weight" else None
        return P("speech_encoder_postnet", "final_proj", name), tr, "params"

    # ---- quantizer ----
    if key == "quantizer.vars":
        return P("quantizer", "vars"), None, "params"
    m = re.match(r"quantizer\.weight_proj\.(weight|bias)$", key)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        tr = _t if m.group(1) == "weight" else None
        return P("quantizer", "weight_proj", name), tr, "params"

    # ---- speaker decoder postnet (s2c) ----
    m = re.match(r"speaker_decoder_postnet\.output_embedding\.weight$", key)
    if m:
        return P("speaker_decoder_postnet", "output_embedding", "kernel"), _t, "params"
    m = re.match(r"speaker_decoder_postnet\.output_projection\.weight$", key)
    if m:
        return P("speaker_decoder_postnet", "projection_weight"), None, "params"
    m = re.match(r"speaker_decoder_postnet\.(bn_pooling|bn_embedding)\.(weight|bias|running_mean|running_var)$", key)
    if m:
        bn, wb = m.groups()
        if wb in ("weight", "bias"):
            name = "scale" if wb == "weight" else "bias"
            return P("speaker_decoder_postnet", bn, name), None, "params"
        name = "mean" if wb == "running_mean" else "var"
        return P("speaker_decoder_postnet", bn, name), None, "batch_stats"
    if "num_batches_tracked" in key:
        return None

    return ("__unknown__",), None, None


def convert_state_dict(state_dict: Dict[str, np.ndarray]):
    """torch state_dict (numpy values) -> (params tree, batch_stats tree,
    unknown_keys list)."""
    params: dict = {}
    batch_stats: dict = {}
    unknown = []
    for key, val in state_dict.items():
        mapped = map_speecht5_key(key)
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


def _wn_effective(g: np.ndarray, v: np.ndarray, dim: int) -> np.ndarray:
    """torch weight_norm: w = g * v / ||v|| with the norm over all dims except
    ``dim`` (g broadcasts along dim)."""
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
    return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)


def convert_hifigan_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """torch HiFi-GAN generator state dict -> HiFiGANGenerator params.

    Accepts HF ``microsoft/speecht5_hifigan`` naming (``upsampler.N``,
    ``mean``/``scale`` buffers) and the original hifigan repo naming
    (``ups.N``), with the conv weight stored either plain (``.weight`` — the
    HF SpeechT5HifiGan state dict before ``apply_weight_norm``), as a legacy
    weight-norm pair (``.weight_g``/``.weight_v``), or as a torch>=2.1
    parametrization (``.parametrizations.weight.original{0,1}``).
    Weight-normed convs are converted via the *effective* weight: we store
    w_eff as weight_v and set weight_g = ||w_eff|| over this module's norm
    axes, so reconstruction g*v/||v|| == w_eff exactly — lossless and
    independent of torch's per-module weight_norm dim convention (dim=0 norms
    per OUT channel for Conv1d but per IN channel for ConvTranspose1d).
    """
    params: dict = {}

    def put(path, val):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(val, np.float32)

    def effective(prefix):
        """Effective conv weight for torch module ``prefix`` regardless of
        which weight(-norm) representation the state dict uses."""
        if f"{prefix}.weight" in sd:
            return np.asarray(sd[f"{prefix}.weight"], np.float64)
        p0 = f"{prefix}.parametrizations.weight.original0"
        if p0 in sd:
            return _wn_effective(
                np.asarray(sd[p0], np.float64),
                np.asarray(
                    sd[f"{prefix}.parametrizations.weight.original1"], np.float64
                ),
                dim=0,
            )
        return _wn_effective(
            np.asarray(sd[f"{prefix}.weight_g"], np.float64),
            np.asarray(sd[f"{prefix}.weight_v"], np.float64),
            dim=0,
        )

    def put_conv(dst, w_eff, transposed=False):
        if transposed:
            # torch ConvTranspose1d weight [in, out, k] -> flax [k, in, out]
            w = np.transpose(w_eff, (2, 0, 1))
        else:
            # torch Conv1d weight [out, in, k] -> flax [k, in, out]
            w = np.transpose(w_eff, (2, 1, 0))
        g_out = np.sqrt((w.astype(np.float64) ** 2).sum(axis=(0, 1)))
        put(dst + ("weight_v",), w)
        put(dst + ("weight_g",), g_out)

    def is_primary(wb: str) -> bool:
        # each conv converted once, keyed off its main weight tensor
        return wb in ("weight", "weight_v", "parametrizations.weight.original1")

    for key in sd:
        m = re.match(r"(conv_pre|conv_post)\.(.+)$", key)
        if m:
            name, wb = m.groups()
            if wb == "bias":
                put((name, "bias"), sd[key])
            elif is_primary(wb):
                put_conv((name,), effective(name))
            continue
        m = re.match(r"(ups|upsampler)\.(\d+)\.(.+)$", key)
        if m:
            mod, i, wb = m.groups()
            if wb == "bias":
                put((f"ups_{i}", "bias"), sd[key])
            elif is_primary(wb):
                put_conv((f"ups_{i}",), effective(f"{mod}.{i}"), transposed=True)
            continue
        m = re.match(r"resblocks\.(\d+)\.(convs1|convs2)\.(\d+)\.(.+)$", key)
        if m:
            n, cs, j, wb = m.groups()
            dst = (f"resblocks_{n}", f"{cs}_{j}")
            if wb == "bias":
                put(dst + ("bias",), sd[key])
            elif is_primary(wb):
                put_conv(dst, effective(f"resblocks.{n}.{cs}.{j}"))
            continue
        if key in ("mean", "mel_mean"):
            put(("mel_mean",), sd[key])
        elif key in ("scale", "mel_scale"):
            put(("mel_scale",), sd[key])
    return params


def load_fairseq_checkpoint(path: str):
    """Load a fairseq .pt with torch (CPU) and convert.  Returns
    (variables dict, cfg dict from the checkpoint, unknown keys)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    sd_np = {k: v.detach().numpy() for k, v in sd.items()}
    params, batch_stats, unknown = convert_state_dict(sd_np)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables, ckpt.get("cfg") or ckpt.get("args"), unknown


def verify_against(variables_conv, variables_init, strict_shapes=True):
    """Check the converted tree covers the initialized tree and shapes match.
    Returns (missing_paths, extra_paths, mismatched)."""
    import jax

    def flat(tree):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path
            )
            out[key] = leaf
        return out

    a, b = flat(variables_conv), flat(variables_init)
    missing = sorted(set(b) - set(a))
    extra = sorted(set(a) - set(b))
    mism = [
        k for k in set(a) & set(b)
        if tuple(np.shape(a[k])) != tuple(np.shape(b[k]))
    ]
    return missing, extra, mism
