"""Loss functions (criterion layer).

Pure functions (model outputs, batch) -> (scalar loss, metrics dict), replacing
the reference's per-task criterion classes:
- S2T:  label-smoothed CE + weighted CTC (reference criterions/speech_to_text_loss.py:113-337)
- T2S:  Tacotron2 L1(+L2) + BCE(stop, pos_weight 5) with masking + guided
        multi-head attention loss (reference criterions/text_to_speech_loss.py:72-427)
- speech pretrain: HuBERT masked CE + feature penalty + codebook diversity +
        weighted TTS-style decoder reconstruction (reference
        criterions/speech_pretrain_criterion.py:50-267)
- text pretrain: BART denoising CE + codebook diversity (reference
        criterions/text_pretrain_criterion.py:35-144)

All losses are token-mean (the reference normalizes per-rank and sets
sample_size=1 — SURVEY.md section 5.5; with pjit the mean over the global batch
is the natural equivalent).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.ctc import ctc_loss
from ..utils.masks import length_mask


def label_smoothed_ce(logits, targets, valid, eps: float = 0.1):
    """fairseq label_smoothed_nll_loss semantics, mean over valid tokens.

    logits: [..., V] f32; targets: [...] int; valid: [...] bool.
    """
    lprobs = jax.nn.log_softmax(logits, axis=-1)
    V = lprobs.shape[-1]
    nll = -jnp.take_along_axis(lprobs, targets[..., None], axis=-1)[..., 0]
    smooth = -lprobs.sum(-1)
    eps_i = eps / (V - 1)
    loss = (1.0 - eps - eps_i) * nll + eps_i * smooth
    w = valid.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    return (loss * w).sum() / denom, (nll * w).sum() / denom


def s2t_loss(
    dec_logits,       # [B, T, V]
    ctc_logits,       # [B, Tenc, V] or None
    enc_valid,        # [B, Tenc] bool
    targets,          # [B, T] (EOS-terminated)
    pad_id: int,
    blank_id: int,
    *,
    eos_id: int = 2,
    ce_weight: float = 1.0,
    ctc_weight: float = 0.0,
    label_smoothing: float = 0.1,
    zero_infinity: bool = False,
):
    valid = targets != pad_id
    metrics = {}
    loss = 0.0
    if ce_weight > 0:
        ce, nll = label_smoothed_ce(dec_logits, targets, valid, label_smoothing)
        loss = loss + ce_weight * ce
        metrics["ce_loss"] = ce
        metrics["nll_loss"] = nll
        pred = dec_logits.argmax(-1)
        metrics["accuracy"] = (
            ((pred == targets) & valid).sum() / jnp.maximum(valid.sum(), 1)
        )
    if ctc_weight > 0 and ctc_logits is not None:
        lp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), axis=-1)
        enc_lengths = enc_valid.astype(jnp.int32).sum(-1)
        # CTC target = tokens without EOS
        tgt_lengths = (valid & (targets != eos_id)).astype(jnp.int32).sum(-1)
        nll_ctc = ctc_loss(lp, enc_lengths, targets, tgt_lengths, blank_id,
                           zero_infinity=zero_infinity)
        ctc = nll_ctc.sum() / jnp.maximum(tgt_lengths.sum(), 1)
        loss = loss + ctc_weight * ctc
        metrics["ctc_loss"] = ctc
    metrics["loss"] = loss
    return loss, metrics


def sid_loss(logits, targets, label_smoothing: float = 0.0):
    """SID (s2c) classification loss: label-smoothed CE over speaker classes +
    accuracy.  The reference routes s2c through SpeechtoTextLoss's CE
    (criterions/speecht5_criterion.py:113, speech_to_text_loss.py:186-209);
    the AM/AAM margin is applied inside the model forward, not here.

    logits: [B, C] f32; targets: [B] int class ids.
    """
    valid = jnp.ones(targets.shape, bool)
    ce, nll = label_smoothed_ce(
        logits.astype(jnp.float32), targets, valid, label_smoothing
    )
    acc = (logits.argmax(-1) == targets).mean()
    return ce, {"loss": ce, "nll_loss": nll, "accuracy": acc}


def fasttext2unit_loss(
    logits,            # [B, Lmax, V] regulated-frame unit logits
    out_valid,         # bool [B, Lmax]
    unit_targets,      # [B, Lmax] (pad beyond target length)
    log_dur_out,       # [B, T]
    durations,         # [B, T] ground-truth integer durations
    src_valid,         # bool [B, T]
    *,
    label_smoothing: float = 0.0,
    dur_loss_weight: float = 1.0,
):
    """FastText2Unit loss: label-smoothed CE over length-regulated frames +
    MSE on log(dur+1) (reference speechlm/criterions/fasttext2unit_loss.py:
    71-115)."""
    ce, nll = label_smoothed_ce(
        logits.astype(jnp.float32), unit_targets, out_valid, label_smoothing
    )
    log_dur = jnp.log(durations.astype(jnp.float32) + 1.0)
    sv = src_valid.astype(jnp.float32)
    dur_mse = ((log_dur_out - log_dur) ** 2 * sv).sum() / jnp.maximum(
        sv.sum(), 1.0
    )
    loss = ce + dur_loss_weight * dur_mse
    acc = (
        ((logits.argmax(-1) == unit_targets) & out_valid).sum()
        / jnp.maximum(out_valid.sum(), 1)
    )
    return loss, {"loss": loss, "ce_loss": ce, "nll_loss": nll,
                  "dur_loss": dur_mse, "accuracy": acc}


def guided_attention_loss(attn, enc_lengths, dec_lengths, sigma: float = 0.4,
                          num_layers: int = 2, num_heads: int = 2):
    """espnet GuidedAttentionLoss over cross-attention maps.

    attn: [L, B, H, Tdec, Tenc] per-layer cross weights.  Applied to the first
    ``num_layers`` layers x first ``num_heads`` heads (reference
    text_to_speech_loss.py:370-427 selects heads via [:, :num_heads]).
    """
    attn = attn[:num_layers, :, :num_heads]  # [l, B, h, Td, Te]
    L, B, H, Td, Te = attn.shape
    t_dec = jnp.arange(Td, dtype=jnp.float32)[None, :, None]
    t_enc = jnp.arange(Te, dtype=jnp.float32)[None, None, :]
    ilen = jnp.maximum(enc_lengths, 1).astype(jnp.float32)[:, None, None]
    olen = jnp.maximum(dec_lengths, 1).astype(jnp.float32)[:, None, None]
    w = 1.0 - jnp.exp(
        -((t_enc / ilen - t_dec / olen) ** 2) / (2.0 * sigma ** 2)
    )  # [B, Td, Te]
    valid = (
        (t_dec < olen) & (t_enc < ilen)
    )  # [B, Td, Te]
    w = jnp.where(valid, w, 0.0)
    num = (attn.astype(jnp.float32) * w[None, :, None]).sum()
    denom = jnp.maximum(valid.sum() * L * H, 1)
    return num / denom


def tts_loss(
    before,           # [B, T, n_mels]
    after,            # [B, T, n_mels]
    stop_logits,      # [B, T]
    target_mel,       # [B, T, n_mels]
    dec_lengths,      # [B] (full-rate frame lengths)
    *,
    reduction_factor: int = 2,
    bce_pos_weight: float = 5.0,
    bce_loss_lambda: float = 1.0,
    loss_type: str = "L1",
    attn=None,        # [L, B, H, Td, Te] cross weights for guided attn
    enc_lengths=None,
    use_guided_attn: bool = False,
    guided_attn_lambda: float = 1.0,
    guided_attn_sigma: float = 0.4,
):
    """Tacotron2 loss with reduction-factor target trimming
    (reference text_to_speech_loss.py:162-169, 263-345)."""
    T = before.shape[1]
    r = reduction_factor
    # trim lengths to a multiple of r (reference :164-166)
    olens = dec_lengths - dec_lengths % r
    mask = length_mask(olens, T)[..., None]                        # [B, T, 1]
    w = mask.astype(jnp.float32)
    denom = jnp.maximum(w.sum() * before.shape[-1], 1.0)

    tgt = target_mel.astype(jnp.float32)
    l1 = (jnp.abs(after - tgt) * w).sum() / denom + (
        jnp.abs(before - tgt) * w
    ).sum() / denom
    l2 = (((after - tgt) ** 2) * w).sum() / denom + (
        ((before - tgt) ** 2) * w
    ).sum() / denom

    # stop labels: 1 at the final valid frame (reference :167-169)
    stop_labels = (
        jnp.arange(T)[None, :] == jnp.maximum(olens - 1, 0)[:, None]
    ).astype(jnp.float32)
    z = stop_logits.astype(jnp.float32)
    bce_el = (
        jnp.maximum(z, 0.0)
        - z * stop_labels
        + jnp.log1p(jnp.exp(-jnp.abs(z)))
        + (bce_pos_weight - 1.0)
        * stop_labels
        * (jnp.log1p(jnp.exp(-jnp.abs(z))) + jnp.maximum(-z, 0.0))
    )
    wm = mask[..., 0].astype(jnp.float32)
    bce = (bce_el * wm).sum() / jnp.maximum(wm.sum(), 1.0)

    if loss_type == "L1":
        loss = l1 + bce_loss_lambda * bce
    elif loss_type == "L2":
        loss = l2 + bce_loss_lambda * bce
    else:
        loss = l1 + l2 + bce_loss_lambda * bce

    metrics = {"l1_loss": l1, "l2_loss": l2, "bce_loss": bce}
    if use_guided_attn and attn is not None:
        ga = guided_attention_loss(
            attn, enc_lengths, olens // r, guided_attn_sigma
        )
        loss = loss + guided_attn_lambda * ga
        metrics["enc_dec_attn_loss"] = ga
    metrics["loss"] = loss
    return loss, metrics


def hubert_loss(
    hubert_logits,    # list of [B, T, C] cosine logits
    target_list,      # list of [B, T] frame labels
    time_mask,        # [B, T] bool: masked positions
    valid_mask,       # [B, T] bool
    *,
    pred_masked_weight: float = 1.0,
    pred_nomask_weight: float = 0.0,
):
    """HuBERT masked/unmasked CE (reference speech_pretrain_criterion.py:99-120;
    the reference's NCE with prepended positive is algebraically CE over the
    codebook — see models/postnets.py)."""
    metrics = {}
    loss = 0.0
    n_masked = jnp.maximum((time_mask & valid_mask).sum(), 1)
    n_unmasked = jnp.maximum((~time_mask & valid_mask).sum(), 1)
    for i, (logits, targets) in enumerate(zip(hubert_logits, target_list)):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        m = (time_mask & valid_mask).astype(jnp.float32)
        u = ((~time_mask) & valid_mask).astype(jnp.float32)
        loss_m = (nll * m).sum() / n_masked
        loss_u = (nll * u).sum() / n_unmasked
        metrics[f"loss_m_{i}"] = loss_m
        metrics[f"loss_u_{i}"] = loss_u
        corr_m = ((logits.argmax(-1) == targets) & time_mask & valid_mask).sum()
        metrics[f"acc_m_{i}"] = corr_m / n_masked
        if pred_masked_weight > 0:
            loss = loss + pred_masked_weight * loss_m
        if pred_nomask_weight > 0:
            loss = loss + pred_nomask_weight * loss_u
    return loss, metrics


def speech_pretrain_loss(
    out: dict,         # forward_pretrain_speech output
    target_list,       # list of [B, T] km labels
    target_mel,        # [B, Tdec, n_mels]
    dec_lengths,       # [B]
    enc_lengths,       # [B]
    *,
    reduction_factor: int = 2,
    dec_weight: float = 1.0,
    hubert_weight: float = 1.0,
    feature_pen_weight: float = 10.0,
    prob_ppl_weight: float = 0.1,
    use_guided_attn: bool = True,
):
    loss, metrics = hubert_loss(
        out["hubert_logits"], target_list, out["time_mask"], out["valid_mask"]
    )
    loss = hubert_weight * loss
    metrics["features_pen"] = out["features_pen"]
    loss = loss + feature_pen_weight * out["features_pen"]
    if out.get("quantizer") is not None:
        q = out["quantizer"]
        div = (q["num_vars"] - q["prob_perplexity"]) / q["num_vars"]
        loss = loss + prob_ppl_weight * div
        metrics["prob_perplexity"] = q["prob_perplexity"]
        metrics["code_perplexity"] = q["code_perplexity"]
    if dec_weight > 0:
        dec_loss, dmetrics = tts_loss(
            out["before"], out["after"], out["stop_logits"],
            target_mel, dec_lengths,
            reduction_factor=reduction_factor,
            attn=out.get("attn"), enc_lengths=enc_lengths,
            use_guided_attn=use_guided_attn,
        )
        loss = loss + dec_weight * dec_loss
        metrics.update({f"dec_{k}": v for k, v in dmetrics.items()})
    metrics["loss"] = loss
    return loss, metrics


def text_pretrain_loss(
    out: dict,        # forward_pretrain_text output
    targets,          # [B, T] denoised target tokens
    pad_id: int,
    *,
    label_smoothing: float = 0.1,
    bart_weight: float = 1.0,
    prob_ppl_weight: float = 0.1,
):
    valid = targets != pad_id
    ce, nll = label_smoothed_ce(out["logits"], targets, valid, label_smoothing)
    loss = bart_weight * ce
    metrics = {"bart_loss": ce, "nll_loss": nll}
    if out.get("quantizer") is not None:
        q = out["quantizer"]
        div = (q["num_vars"] - q["prob_perplexity"]) / q["num_vars"]
        loss = loss + prob_ppl_weight * div
        metrics["prob_perplexity"] = q["prob_perplexity"]
    metrics["loss"] = loss
    return loss, metrics
