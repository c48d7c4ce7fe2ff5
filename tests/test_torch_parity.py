"""Numeric parity against torch oracles that mirror the reference math.

The round-trip converter test (tests/test_convert.py) can't catch a systematic
layout misunderstanding because it inverts our own mapping.  These tests build
REAL torch modules implementing the reference equations —
- rel-pos MHA first-order bias B = q_scaled @ pe_k[clip(i-j)]^T
  (reference modules/multihead_attention.py:343-353),
- encoder layer post-LN/pre-LN with per-head-dim norm_k applied to the pos
  table only on the pre-LN path (reference modules/transformer_layer.py:90-119),
- wav2vec2 conv feature extractor with GroupNorm on the first block
  (reference modules/speech_encoder_prenet.py:278-374),
- decoder layer with cross-attention (reference transformer_layer.py:137-404) —
then run the same weights through the converter's layout transforms into our
flax modules and assert parity at fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from speecht5_tpu.config import TransformerConfig, RelPosConfig, ConvFeatureConfig
from speecht5_tpu.models.attention import MultiheadAttention
from speecht5_tpu.models.layers import EncoderLayer, DecoderLayer
from speecht5_tpu.models.encoder import TransformerEncoder
from speecht5_tpu.models.prenets import ConvFeatureExtractor
from speecht5_tpu.utils.convert import convert_state_dict

torch.manual_seed(0)

D, H, T, M, B = 32, 4, 12, 8, 2
Dh = D // H
ATOL = 1e-4


def t2j(x):
    return jnp.asarray(x.detach().numpy())


def lin_params(lin):
    p = {"kernel": jnp.asarray(lin.weight.detach().numpy().T)}
    if lin.bias is not None:
        p["bias"] = jnp.asarray(lin.bias.detach().numpy())
    return p


def ln_params(ln):
    return {"scale": t2j(ln.weight), "bias": t2j(ln.bias)}


def rel_pos_table(pe_emb, Tq, Tk):
    """pe_k[clip(i-j)] per the reference RelativePositionalEncoding
    (encoder.py:40-59): positions i-j clipped to [-M, M-1], offset +M."""
    i = torch.arange(Tq)[:, None]
    j = torch.arange(Tk)[None, :]
    idx = torch.clamp(i - j, -M, M - 1) + M
    return pe_emb(idx)  # [Tq, Tk, Dh]


def torch_mha(x, q_proj, k_proj, v_proj, out_proj, pos_k=None, causal=False):
    """Reference MHA forward (multihead_attention.py:231-353), batch-major in."""
    Bb, Tt, _ = x.shape
    q = (F.linear(x, q_proj.weight, q_proj.bias)) * Dh ** -0.5
    k = F.linear(x, k_proj.weight, k_proj.bias)
    v = F.linear(x, v_proj.weight, v_proj.bias)

    def split(z):
        return z.reshape(Bb, Tt, H, Dh).permute(0, 2, 1, 3).reshape(Bb * H, Tt, Dh)

    q, k, v = split(q), split(k), split(v)
    attn = torch.bmm(q, k.transpose(1, 2))
    if pos_k is not None:
        # reference :343-353: reshape_q [T, B*H, Dh] @ pos_k^T -> [T, B*H, T]
        reshape_q = q.reshape(Bb * H, Tt, Dh).transpose(0, 1)
        Bterm = torch.matmul(reshape_q, pos_k.transpose(-2, -1))
        attn = attn + Bterm.transpose(0, 1)
    if causal:
        mask = torch.triu(torch.full((Tt, Tt), float("-inf")), diagonal=1)
        attn = attn + mask[None]
    w = F.softmax(attn, dim=-1)
    out = torch.bmm(w, v)
    out = out.reshape(Bb, H, Tt, Dh).permute(0, 2, 1, 3).reshape(Bb, Tt, D)
    return F.linear(out, out_proj.weight, out_proj.bias)


@pytest.fixture(scope="module")
def torch_attn():
    return {
        name: torch.nn.Linear(D, D)
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }


class TestRelPosMHA:
    def test_plain_attention_parity(self, torch_attn, rng):
        x = torch.randn(B, T, D)
        want = torch_mha(x, torch_attn["q_proj"], torch_attn["k_proj"],
                         torch_attn["v_proj"], torch_attn["out_proj"])

        mod = MultiheadAttention(D, H)
        params = {m: lin_params(torch_attn[m]) for m in torch_attn}
        got, _, _ = mod.apply({"params": params}, t2j(x))
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                                   atol=ATOL)

    def test_relpos_bias_parity(self, torch_attn):
        pe_emb = torch.nn.Embedding(2 * M, Dh)
        x = torch.randn(B, T, D)
        pos_k = rel_pos_table(pe_emb, T, T)
        want = torch_mha(x, torch_attn["q_proj"], torch_attn["k_proj"],
                         torch_attn["v_proj"], torch_attn["out_proj"],
                         pos_k=pos_k)

        mod = MultiheadAttention(D, H)
        params = {m: lin_params(torch_attn[m]) for m in torch_attn}
        got, _, _ = mod.apply(
            {"params": params}, t2j(x),
            pos_table=t2j(pe_emb.weight), max_dist=M,
        )
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                                   atol=ATOL)

    def test_relpos_bias_parity_causal_step(self, torch_attn):
        """Step decode (Tq=1 at position t) vs full causal attention row t."""
        pe_emb = torch.nn.Embedding(2 * M, Dh)
        x = torch.randn(1, T, D)
        pos_k = rel_pos_table(pe_emb, T, T)
        want = torch_mha(x, torch_attn["q_proj"], torch_attn["k_proj"],
                         torch_attn["v_proj"], torch_attn["out_proj"],
                         pos_k=pos_k, causal=True)

        mod = MultiheadAttention(D, H)
        params = {m: lin_params(torch_attn[m]) for m in torch_attn}
        cache = {
            "k": jnp.zeros((1, T, H, Dh)),
            "v": jnp.zeros((1, T, H, Dh)),
        }
        outs = []
        for t in range(T):
            got, _, cache = mod.apply(
                {"params": params}, t2j(x[:, t : t + 1]),
                causal=True, pos_table=t2j(pe_emb.weight), max_dist=M,
                cache=cache, cache_index=t,
            )
            outs.append(np.asarray(got)[:, 0])
        got_all = np.stack(outs, axis=1)
        np.testing.assert_allclose(got_all, want.detach().numpy(), atol=ATOL)


def torch_encoder_layer(x, mods, pos_k, layer_norm_first):
    """Reference TransformerSentenceEncoderLayer forward
    (transformer_layer.py:76-134), dropout-free."""
    residual = x
    if layer_norm_first:
        x = mods["self_attn_layer_norm"](x)
        pb = mods["norm_k"](pos_k) if pos_k is not None else None
        x = torch_mha(x, mods["q_proj"], mods["k_proj"], mods["v_proj"],
                      mods["out_proj"], pos_k=pb)
        x = residual + x
        residual = x
        x = mods["final_layer_norm"](x)
        x = mods["fc2"](F.gelu(mods["fc1"](x)))
        return residual + x
    x = torch_mha(x, mods["q_proj"], mods["k_proj"], mods["v_proj"],
                  mods["out_proj"], pos_k=pos_k)  # norm_k NOT applied post-LN
    x = residual + x
    x = mods["self_attn_layer_norm"](x)
    residual = x
    x = mods["fc2"](F.gelu(mods["fc1"](x)))
    x = residual + x
    return mods["final_layer_norm"](x)


def make_torch_layer():
    return {
        "q_proj": torch.nn.Linear(D, D),
        "k_proj": torch.nn.Linear(D, D),
        "v_proj": torch.nn.Linear(D, D),
        "out_proj": torch.nn.Linear(D, D),
        "self_attn_layer_norm": torch.nn.LayerNorm(D),
        "final_layer_norm": torch.nn.LayerNorm(D),
        "fc1": torch.nn.Linear(D, D * 2),
        "fc2": torch.nn.Linear(D * 2, D),
        "norm_k": torch.nn.LayerNorm(Dh),
    }


def flax_layer_params(mods):
    return {
        "self_attn": {m: lin_params(mods[m])
                      for m in ("q_proj", "k_proj", "v_proj", "out_proj")},
        "self_attn_layer_norm": ln_params(mods["self_attn_layer_norm"]),
        "final_layer_norm": ln_params(mods["final_layer_norm"]),
        "ffn": {"fc1": lin_params(mods["fc1"]), "fc2": lin_params(mods["fc2"])},
        "norm_k": ln_params(mods["norm_k"]),
    }


class TestEncoderLayer:
    @pytest.mark.parametrize("layer_norm_first", [False, True])
    def test_parity(self, layer_norm_first):
        mods = make_torch_layer()
        pe_emb = torch.nn.Embedding(2 * M, Dh)
        x = torch.randn(B, T, D)
        pos_k = rel_pos_table(pe_emb, T, T)
        want = torch_encoder_layer(x, mods, pos_k, layer_norm_first)

        cfg = TransformerConfig(
            d_model=D, ffn_dim=D * 2, num_heads=H, dropout=0.0,
            attention_dropout=0.0, layer_norm_first=layer_norm_first,
            rel_pos=RelPosConfig(max_distance=M),
        )
        layer = EncoderLayer(cfg)
        got, _ = layer.apply(
            {"params": flax_layer_params(mods)}, t2j(x),
            pos_table=t2j(pe_emb.weight),
        )
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                                   atol=ATOL)


class TestDecoderLayer:
    def test_cross_attention_parity(self):
        """Post-LN decoder layer (self causal + cross + ffn), reference
        transformer_layer.py:293-404 with dropout off."""
        mods = make_torch_layer()
        cross = {
            "q_proj": torch.nn.Linear(D, D),
            "k_proj": torch.nn.Linear(D, D),
            "v_proj": torch.nn.Linear(D, D),
            "out_proj": torch.nn.Linear(D, D),
            "ln": torch.nn.LayerNorm(D),
        }
        x = torch.randn(B, T, D)
        enc = torch.randn(B, 7, D)

        # torch oracle
        residual = x
        h = torch_mha(x, mods["q_proj"], mods["k_proj"], mods["v_proj"],
                      mods["out_proj"], causal=True)
        h = mods["self_attn_layer_norm"](residual + h)
        residual = h
        q = (F.linear(h, cross["q_proj"].weight, cross["q_proj"].bias)) * Dh ** -0.5
        k = F.linear(enc, cross["k_proj"].weight, cross["k_proj"].bias)
        v = F.linear(enc, cross["v_proj"].weight, cross["v_proj"].bias)
        qh = q.reshape(B, T, H, Dh).permute(0, 2, 1, 3)
        kh = k.reshape(B, 7, H, Dh).permute(0, 2, 1, 3)
        vh = v.reshape(B, 7, H, Dh).permute(0, 2, 1, 3)
        w = F.softmax(qh @ kh.transpose(-2, -1), dim=-1)
        c = (w @ vh).permute(0, 2, 1, 3).reshape(B, T, D)
        c = F.linear(c, cross["out_proj"].weight, cross["out_proj"].bias)
        h = cross["ln"](residual + c)
        residual = h
        f = mods["fc2"](F.gelu(mods["fc1"](h)))
        want = mods["final_layer_norm"](residual + f)

        cfg = TransformerConfig(
            d_model=D, ffn_dim=D * 2, num_heads=H, dropout=0.0,
            attention_dropout=0.0, layer_norm_first=False,
            use_rel_pos_bias=False, rel_pos=RelPosConfig(max_distance=M),
        )
        layer = DecoderLayer(cfg)
        params = flax_layer_params(mods)
        del params["norm_k"]
        params["encoder_attn"] = {
            m: lin_params(cross[m])
            for m in ("q_proj", "k_proj", "v_proj", "out_proj")
        }
        params["encoder_attn_layer_norm"] = ln_params(cross["ln"])
        got, _, _ = layer.apply({"params": params}, t2j(x), t2j(enc))
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                                   atol=ATOL)


class TestConvFeatureExtractor:
    def test_default_mode_parity(self):
        """7-layer w2v2 stack, GroupNorm(d, d) on block 0 only, GELU
        (reference speech_encoder_prenet.py:278-374, mode='default')."""
        layers = ((16, 10, 5), (16, 3, 2), (16, 2, 2))
        convs = []
        for i, (c, k, s) in enumerate(layers):
            in_c = 1 if i == 0 else layers[i - 1][0]
            convs.append(torch.nn.Conv1d(in_c, c, k, stride=s, bias=False))
        gn = torch.nn.GroupNorm(layers[0][0], layers[0][0])
        wav = torch.randn(B, 8000)

        x = wav[:, None, :]
        for i, conv in enumerate(convs):
            x = conv(x)
            if i == 0:
                x = gn(x)
            x = F.gelu(x)
        want = x.transpose(1, 2)  # [B, frames, C]

        cfg = ConvFeatureConfig(layers=layers, mode="default", bias=False)
        mod = ConvFeatureExtractor(cfg)
        params = {}
        for i, conv in enumerate(convs):
            params[f"conv_{i}"] = {
                "kernel": jnp.asarray(
                    conv.weight.detach().numpy().transpose(2, 1, 0)
                )
            }
        params["group_norm"] = {"scale": t2j(gn.weight), "bias": t2j(gn.bias)}
        got = mod.apply({"params": params}, t2j(wav))
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                                   atol=ATOL)


class TestFullEncoderViaConverter:
    def test_fairseq_state_dict_roundtrip(self):
        """Build a REAL torch state dict with fairseq key names, convert with
        convert_state_dict, run the full encoder stack both ways.  Catches
        layout misunderstandings the synthetic-inverse test can't
        (VERDICT round-1 weak #3)."""
        n_layers = 2
        tlayers = [make_torch_layer() for _ in range(n_layers)]
        pe_emb = torch.nn.Embedding(2 * M, Dh)
        top_ln = torch.nn.LayerNorm(D)
        proj = torch.nn.Linear(D, 11)

        sd = {}
        for i, mods in enumerate(tlayers):
            pre = f"encoder.layers.{i}"
            for m in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[f"{pre}.self_attn.{m}.weight"] = mods[m].weight.detach().numpy()
                sd[f"{pre}.self_attn.{m}.bias"] = mods[m].bias.detach().numpy()
            for ln in ("self_attn_layer_norm", "final_layer_norm", "norm_k"):
                sd[f"{pre}.{ln}.weight"] = mods[ln].weight.detach().numpy()
                sd[f"{pre}.{ln}.bias"] = mods[ln].bias.detach().numpy()
            for fc in ("fc1", "fc2"):
                sd[f"{pre}.{fc}.weight"] = mods[fc].weight.detach().numpy()
                sd[f"{pre}.{fc}.bias"] = mods[fc].bias.detach().numpy()
        sd["encoder.layer_norm.weight"] = top_ln.weight.detach().numpy()
        sd["encoder.layer_norm.bias"] = top_ln.bias.detach().numpy()
        sd["encoder.pos_emb.pe_k.weight"] = pe_emb.weight.detach().numpy()
        sd["encoder.proj.weight"] = proj.weight.detach().numpy()
        sd["encoder.proj.bias"] = proj.bias.detach().numpy()

        params, batch_stats, unknown = convert_state_dict(sd)
        assert not unknown, unknown

        # torch oracle: post-LN stack applies the top LN to the INPUT
        # (reference encoder.py:226-227)
        x = torch.randn(B, T, D)
        pos_k = rel_pos_table(pe_emb, T, T)
        h = top_ln(x)
        for mods in tlayers:
            h = torch_encoder_layer(h, mods, pos_k, layer_norm_first=False)
        want_out = h
        want_ctc = F.linear(h, proj.weight, proj.bias)

        cfg = TransformerConfig(
            d_model=D, ffn_dim=D * 2, num_layers=n_layers, num_heads=H,
            dropout=0.0, attention_dropout=0.0, layer_norm_first=False,
            rel_pos=RelPosConfig(max_distance=M),
        )
        enc = TransformerEncoder(cfg, ctc_vocab_size=11)
        out = enc.apply(
            {"params": params["encoder"]}, t2j(x),
            jnp.ones((B, T), bool), with_ctc=True,
        )
        np.testing.assert_allclose(
            np.asarray(out["encoder_out"]), want_out.detach().numpy(), atol=ATOL
        )
        np.testing.assert_allclose(
            np.asarray(out["ctc_logits"]), want_ctc.detach().numpy(), atol=ATOL
        )
