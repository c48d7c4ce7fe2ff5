"""Converter round-trip test: build a synthetic fairseq-layout state dict from
the initialized param tree (inverse mapping), convert it, and check full
coverage + exact value round-trip.  (Real released .pt checkpoints are not
available in this environment; this validates the mapping mechanics.)"""

import numpy as np
import jax
import pytest

from speecht5_tpu.config import speecht5_tiny
from speecht5_tpu.models.speecht5 import init_model
from speecht5_tpu.utils.convert import convert_state_dict, verify_against


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def inverse_key(path, arr):
    """Our param path -> (torch key, torch-layout array).  Inverse of
    utils/convert.py's map_speecht5_key for the paths the tiny config covers."""
    p = "/".join(path)
    t = lambda x: np.transpose(x)
    conv = lambda x: np.transpose(x, (2, 0, 1))  # [k,in,out]->[out,in,k]? no:
    # inverse of _conv ([out,in,k]->[k,in,out]) is (2,1,0)
    conv = lambda x: np.transpose(x, (2, 1, 0))

    import re

    m = re.match(r"speech_encoder_prenet/feature_extractor/conv_(\d+)/kernel", p)
    if m:
        return f"speech_encoder_prenet.feature_extractor.conv_layers.{m.group(1)}.0.weight", conv(arr)
    m = re.match(r"speech_encoder_prenet/feature_extractor/group_norm/(scale|bias)", p)
    if m:
        wb = "weight" if m.group(1) == "scale" else "bias"
        return f"speech_encoder_prenet.feature_extractor.conv_layers.0.2.{wb}", arr
    m = re.match(r"speech_encoder_prenet/feature_extractor/ln_(\d+)/(scale|bias)", p)
    if m:
        wb = "weight" if m.group(2) == "scale" else "bias"
        return f"speech_encoder_prenet.feature_extractor.conv_layers.{m.group(1)}.2.1.{wb}", arr
    m = re.match(r"speech_encoder_prenet/layer_norm/(scale|bias)", p)
    if m:
        wb = "weight" if m.group(1) == "scale" else "bias"
        return f"speech_encoder_prenet.layer_norm.{wb}", arr
    m = re.match(r"speech_encoder_prenet/post_extract_proj/(kernel|bias)", p)
    if m:
        if m.group(1) == "kernel":
            return "speech_encoder_prenet.post_extract_proj.weight", t(arr)
        return "speech_encoder_prenet.post_extract_proj.bias", arr
    if p == "speech_encoder_prenet/mask_emb":
        return "speech_encoder_prenet.mask_emb", arr
    if p == "speech_encoder_prenet/pos_conv/weight_g":
        return "speech_encoder_prenet.pos_conv.0.weight_g", conv(arr)
    if p == "speech_encoder_prenet/pos_conv/weight_v":
        return "speech_encoder_prenet.pos_conv.0.weight_v", conv(arr)
    if p == "speech_encoder_prenet/pos_conv/bias":
        return "speech_encoder_prenet.pos_conv.0.bias", arr
    if p == "text_encoder_prenet/embed_tokens/embedding":
        return "text_encoder_prenet.encoder_prenet.0.weight", arr
    if p == "text_encoder_prenet/alpha":
        return "text_encoder_prenet.encoder_prenet.1.alpha", arr

    m = re.match(r"(encoder|decoder)/layers_(\d+)/(self_attn|encoder_attn)/(\w+_proj)/(kernel|bias)", p)
    if m:
        stack, i, attn, proj, kb = m.groups()
        wb = "weight" if kb == "kernel" else "bias"
        val = t(arr) if kb == "kernel" else arr
        return f"{stack}.layers.{i}.{attn}.{proj}.{wb}", val
    m = re.match(r"(encoder|decoder)/layers_(\d+)/(self_attn_layer_norm|encoder_attn_layer_norm|final_layer_norm|norm_k)/(scale|bias)", p)
    if m:
        stack, i, ln, sb = m.groups()
        wb = "weight" if sb == "scale" else "bias"
        return f"{stack}.layers.{i}.{ln}.{wb}", arr
    m = re.match(r"(encoder|decoder)/layers_(\d+)/ffn/(fc1|fc2)/(kernel|bias)", p)
    if m:
        stack, i, fc, kb = m.groups()
        wb = "weight" if kb == "kernel" else "bias"
        val = t(arr) if kb == "kernel" else arr
        return f"{stack}.layers.{i}.{fc}.{wb}", val
    m = re.match(r"(encoder|decoder)/layer_norm/(scale|bias)", p)
    if m:
        wb = "weight" if m.group(2) == "scale" else "bias"
        return f"{m.group(1)}.layer_norm.{wb}", arr
    m = re.match(r"(encoder|decoder)/pos_emb/pe_k/embedding", p)
    if m:
        return f"{m.group(1)}.pos_emb.pe_k.weight", arr
    m = re.match(r"encoder/proj/(kernel|bias)", p)
    if m:
        if m.group(1) == "kernel":
            return "encoder.proj.weight", t(arr)
        return "encoder.proj.bias", arr

    if p == "text_decoder_prenet/embed_tokens/embedding":
        return "text_decoder_prenet.embed_tokens.weight", arr
    if p == "text_decoder_postnet/output_projection/kernel":
        return "text_decoder_postnet.output_projection.weight", t(arr)

    m = re.match(r"speech_decoder_prenet/prenet/layer_(\d+)/(kernel|bias)", p)
    if m:
        i, kb = m.groups()
        wb = "weight" if kb == "kernel" else "bias"
        val = t(arr) if kb == "kernel" else arr
        return f"speech_decoder_prenet.decoder_prenet.0.0.prenet.{i}.0.{wb}", val
    m = re.match(r"speech_decoder_prenet/proj/(kernel|bias)", p)
    if m:
        kb = m.group(1)
        wb = "weight" if kb == "kernel" else "bias"
        val = t(arr) if kb == "kernel" else arr
        return f"speech_decoder_prenet.decoder_prenet.0.1.{wb}", val
    if p == "speech_decoder_prenet/alpha":
        return "speech_decoder_prenet.decoder_prenet.1.alpha", arr
    m = re.match(r"speech_decoder_prenet/spkembs_layer/(kernel|bias)", p)
    if m:
        kb = m.group(1)
        wb = "weight" if kb == "kernel" else "bias"
        val = t(arr) if kb == "kernel" else arr
        return f"speech_decoder_prenet.spkembs_layer.0.{wb}", val

    m = re.match(r"speech_decoder_postnet/(feat_out|prob_out)/(kernel|bias)", p)
    if m:
        layer, kb = m.groups()
        wb = "weight" if kb == "kernel" else "bias"
        val = t(arr) if kb == "kernel" else arr
        return f"speech_decoder_postnet.{layer}.{wb}", val
    m = re.match(r"speech_decoder_postnet/postnet/conv_(\d+)/kernel", p)
    if m:
        return f"speech_decoder_postnet.postnet.postnet.{m.group(1)}.0.weight", conv(arr)
    m = re.match(r"speech_decoder_postnet/postnet/bn_(\d+)/(scale|bias|mean|var)", p)
    if m:
        i, sb = m.groups()
        name = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                "var": "running_var"}[sb]
        return f"speech_decoder_postnet.postnet.postnet.{i}.1.{name}", arr

    if p == "speech_encoder_postnet/label_embs_concat":
        return "hubert_layer.label_embs_concat", arr
    m = re.match(r"speech_encoder_postnet/final_proj/(kernel|bias)", p)
    if m:
        kb = m.group(1)
        wb = "weight" if kb == "kernel" else "bias"
        val = t(arr) if kb == "kernel" else arr
        return f"hubert_layer.final_proj.{wb}", val

    return None


@pytest.fixture(scope="module")
def tiny_vars():
    cfg = speecht5_tiny()
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    return variables


class TestConverter:
    def test_round_trip_full_coverage(self, tiny_vars):
        flat_params = flatten(tiny_vars["params"])
        flat_bstats = flatten(tiny_vars.get("batch_stats", {}))
        sd = {}
        unmappable = []
        for path, arr in {**flat_params, **flat_bstats}.items():
            inv = inverse_key(path, arr)
            if inv is None:
                unmappable.append("/".join(path))
                continue
            sd[inv[0]] = inv[1]
        # every param in the tiny model must have a torch-side name
        assert unmappable == [], f"paths with no inverse mapping: {unmappable}"

        params, batch_stats, unknown = convert_state_dict(sd)
        assert unknown == []
        missing, extra, mism = verify_against(
            {"params": params, "batch_stats": batch_stats}, tiny_vars
        )
        assert missing == [], missing
        assert extra == [], extra
        assert mism == [], mism

        # exact value round trip through the layout transforms
        conv_flat = flatten(params)
        for path, arr in flat_params.items():
            np.testing.assert_array_equal(
                conv_flat[path], arr, err_msg="/".join(path)
            )

    def test_unknown_keys_reported(self):
        params, bstats, unknown = convert_state_dict(
            {"bogus.module.weight": np.zeros((3, 3), np.float32)}
        )
        assert unknown == ["bogus.module.weight"]
