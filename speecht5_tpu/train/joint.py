"""Joint speech+text pretraining step (SpeechUT/Speech2S, SpeechLM).

Behavioral spec from reference SpeechUT/speechut/criterions/speechut_criterion.py
:166-265 (the same file is byte-identical in Speech2S): one update consumes a
heterogeneous sample {speech, text_mono, text_paired} and runs MULTIPLE model
forwards —
  1. speech -> HuBERT masked-unit loss (the base sample_size),
  2. paired units->text -> CE (+ CTC), each rescaled by
     sample_size / text_sample_size,
  3. mono units -> masked unit modeling (MUM), rescaled by
     sample_size / unit_sample_size —
and sums them into one scalar so a single backward covers all modalities.

Here the three forwards live in ONE jitted loss so XLA fuses/overlaps them;
sub-batches keep their own static shapes (bucketed by the data layer).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import criterions


@dataclass(frozen=True)
class JointLossConfig:
    """Weights mirror the reference flags (speechut_criterion.py:46-50)."""

    u2t_ed_weight: float = 0.1
    u2t_ctc_weight: float = 0.0
    text_mum_weight: float = 0.5
    label_smoothing: float = 0.1
    pred_masked_weight: float = 1.0
    pred_nomask_weight: float = 0.0
    # reference ctc_ce.py zero_infinity (configurable there too)
    zero_infinity: bool = False


def make_speechlm_joint_loss(model, jcfg: JointLossConfig):
    """SpeechLM joint step (reference speechlm/criterions/speechlm_criterion.py
    :66-200): speech branch = dual HuBERT losses (level 0 pre-mix + level 1
    post-unit-encoder) + optional l2 embedding tie; text branch = masked-unit
    LM (+ char CTC vs paired char targets when present).

    batch = {
      "speech": {wav, wav_lengths, units},
      "text":   {units [, char_targets]} or None,
    }
    """
    mcfg = model.cfg

    def loss_fn(params, batch, rng):
        variables = {"params": params}
        metrics = {}
        sp = batch["speech"]
        rngs = {"mask": rng, "dropout": jax.random.fold_in(rng, 1),
                "mix": jax.random.fold_in(rng, 2)}
        out = model.apply(
            variables, sp["wav"], sp["wav_lengths"], sp["units"],
            mask=True, deterministic=False, rngs=rngs,
            method="forward_speech",
        )
        loss, m = criterions.hubert_loss(
            [out["logits_0"], out["logits_1"]], [sp["units"], sp["units"]],
            out["time_mask"], out["valid_mask"],
            pred_masked_weight=jcfg.pred_masked_weight,
            pred_nomask_weight=jcfg.pred_nomask_weight,
        )
        metrics.update({f"speech_{k}": v for k, v in m.items()})
        if out.get("l2_loss") is not None:
            loss = loss + out["l2_loss"]
            metrics["l2_loss"] = out["l2_loss"]
        sample_size = (out["time_mask"] & out["valid_mask"]).sum()

        tx = batch.get("text")
        if tx is not None:
            rngs_t = {"mask": jax.random.fold_in(rng, 3),
                      "dropout": jax.random.fold_in(rng, 4)}
            t_out = model.apply(
                variables, tx["units"], mask=True, deterministic=False,
                rngs=rngs_t, method="forward_text",
            )
            if jcfg.text_mum_weight > 0 and "mum_logits" in t_out:
                mum_loss, mm = criterions.hubert_loss(
                    [t_out["mum_logits"]], [tx["units"]],
                    t_out["time_mask"], t_out["valid_mask"],
                    pred_masked_weight=jcfg.pred_masked_weight,
                    pred_nomask_weight=jcfg.pred_nomask_weight,
                )
                msize = jnp.maximum(
                    (t_out["time_mask"] & t_out["valid_mask"]).sum(), 1
                )
                loss = loss + jcfg.text_mum_weight * mum_loss * (
                    sample_size / msize
                )
                metrics.update({f"mum_{k}": v for k, v in mm.items()})
            if (jcfg.u2t_ctc_weight > 0 and "ctc_logits" in t_out
                    and "char_targets" in tx):
                from ..ops.ctc import ctc_loss

                lp = jax.nn.log_softmax(
                    t_out["ctc_logits"].astype(jnp.float32), axis=-1
                )
                in_lengths = t_out["valid_mask"].astype(jnp.int32).sum(-1)
                ct = tx["char_targets"]
                ct_lengths = (ct != mcfg.pad_id).astype(jnp.int32).sum(-1)
                nll = ctc_loss(lp, in_lengths, ct, ct_lengths, 0,
                               zero_infinity=jcfg.zero_infinity)
                tsize = jnp.maximum(ct_lengths.sum(), 1)
                ctc = nll.sum() / tsize
                loss = loss + jcfg.u2t_ctc_weight * ctc * (sample_size / tsize)
                metrics["char_ctc_loss"] = ctc

        metrics["loss"] = loss
        metrics["sample_size"] = sample_size
        return loss, metrics

    return loss_fn


def make_speechut_joint_loss(model, jcfg: JointLossConfig):
    """Returns loss_fn(params, batch, rng) -> (loss, metrics).

    batch = {
      "speech":      {wav, wav_lengths, units [B, frames]},
      "text_paired": {units, prev_tokens, targets} or None,
      "text_mono":   {units} or None,
    }
    """
    mcfg = model.cfg

    def loss_fn(params, batch, rng):
        variables = {"params": params}
        metrics = {}

        # ---- 1. speech branch: masked-unit prediction ----
        sp = batch["speech"]
        rngs = {"mask": rng, "dropout": jax.random.fold_in(rng, 1),
                "mix": jax.random.fold_in(rng, 6)}
        out = model.apply(
            variables, sp["wav"], sp["wav_lengths"], sp["units"],
            mask=True, deterministic=False, rngs=rngs,
            method="forward_speech",
        )
        logits = out["hubert_logits"]
        if not isinstance(logits, (list, tuple)):
            logits = [logits]
        loss, hub_metrics = criterions.hubert_loss(
            logits, [sp["units"]], out["time_mask"], out["valid_mask"],
            pred_masked_weight=jcfg.pred_masked_weight,
            pred_nomask_weight=jcfg.pred_nomask_weight,
        )
        metrics.update({f"speech_{k}": v for k, v in hub_metrics.items()})
        # the reference uses the speech sample size as the base denominator
        # and rescales every text loss by sample_size / text_sample_size
        sample_size = (out["time_mask"] & out["valid_mask"]).sum()

        # ---- 2. paired units -> text ----
        tp = batch.get("text_paired")
        if tp is not None and (jcfg.u2t_ed_weight + jcfg.u2t_ctc_weight) > 0:
            rngs_t = {"dropout": jax.random.fold_in(rng, 2),
                      "mask": jax.random.fold_in(rng, 5)}
            t_out = model.apply(
                variables, tp["units"], tp["prev_tokens"],
                deterministic=False, rngs=rngs_t, method="forward_unit_text",
            )
            tgt_valid = tp["targets"] != mcfg.pad_id
            text_sample_size = jnp.maximum(tgt_valid.sum(), 1)
            scale = sample_size / text_sample_size
            if jcfg.u2t_ed_weight > 0:
                ce, nll = criterions.label_smoothed_ce(
                    t_out["dec_logits"].astype(jnp.float32), tp["targets"],
                    tgt_valid, jcfg.label_smoothing,
                )
                loss = loss + jcfg.u2t_ed_weight * ce * scale
                metrics["text_dec_loss"] = ce
                metrics["text_dec_acc"] = (
                    ((t_out["dec_logits"].argmax(-1) == tp["targets"])
                     & tgt_valid).sum() / text_sample_size
                )
            if jcfg.u2t_ctc_weight > 0 and "ctc_logits" in t_out:
                lp = jax.nn.log_softmax(
                    t_out["ctc_logits"].astype(jnp.float32), axis=-1
                )
                in_lengths = t_out["valid_mask"].astype(jnp.int32).sum(-1)
                tgt_lengths = (
                    tgt_valid & (tp["targets"] != mcfg.eos_id)
                ).astype(jnp.int32).sum(-1)
                from ..ops.ctc import ctc_loss

                nll_ctc = ctc_loss(
                    lp, in_lengths, tp["targets"], tgt_lengths, mcfg.blank_id,
                    zero_infinity=jcfg.zero_infinity,
                )
                ctc = nll_ctc.sum() / text_sample_size
                loss = loss + jcfg.u2t_ctc_weight * ctc * scale
                metrics["text_ctc_loss"] = ctc

        # ---- 3. mono units: masked unit modeling ----
        tm = batch.get("text_mono")
        if tm is not None and jcfg.text_mum_weight > 0:
            rngs_m = {"mask": jax.random.fold_in(rng, 3),
                      "dropout": jax.random.fold_in(rng, 4)}
            m_out = model.apply(
                variables, tm["units"], deterministic=False, rngs=rngs_m,
                method="forward_mum",
            )
            mum_loss, mum_metrics = criterions.hubert_loss(
                [m_out["mum_logits"]], [tm["units"]],
                m_out["time_mask"], m_out["valid_mask"],
                pred_masked_weight=jcfg.pred_masked_weight,
                pred_nomask_weight=jcfg.pred_nomask_weight,
            )
            mum_size = jnp.maximum(
                (m_out["time_mask"] & m_out["valid_mask"]).sum(), 1
            )
            loss = loss + jcfg.text_mum_weight * mum_loss * (
                sample_size / mum_size
            )
            metrics.update({f"mum_{k}": v for k, v in mum_metrics.items()})

        metrics["loss"] = loss
        metrics["sample_size"] = sample_size
        return loss, metrics

    return loss_fn


def make_yitrans_pretrain_loss(model, jcfg: JointLossConfig,
                               text_weight: float = 1.0):
    """YiTrans stage-1 joint pretraining step (reference
    YiTrans/yitrans_iwslt22/models/pretrain_ed.py:200 + the task's
    MultiCorpusDataset composition, tasks/iwslt_joint_pretraining.py:360-540):
    masked speech prediction over km units + multilingual BART denoising CE
    over langid-tagged text.

    batch = {
      "speech":    {wav, wav_lengths, units [B, frames]},
      "text_mono": {src_tokens, prev_tokens, targets} or None
                   (MultilingualDenoisingDataset.collate output),
    }
    """
    mcfg = model.cfg

    def loss_fn(params, batch, rng):
        variables = {"params": params}
        metrics = {}
        sp = batch["speech"]
        rngs = {"mask": rng, "dropout": jax.random.fold_in(rng, 1)}
        enc = model.apply(
            variables, sp["wav"], sp["wav_lengths"], mask=True,
            deterministic=False, rngs=rngs, method="encode_speech",
        )
        sp_logits = model.apply(variables, enc, method="hubert_logits")
        loss, m = criterions.hubert_loss(
            [sp_logits], [sp["units"]], enc["time_mask"], enc["valid_mask"],
            pred_masked_weight=jcfg.pred_masked_weight,
            pred_nomask_weight=jcfg.pred_nomask_weight,
        )
        metrics.update({f"speech_{k}": v for k, v in m.items()})
        sample_size = (enc["time_mask"] & enc["valid_mask"]).sum()

        tm = batch.get("text_mono")
        if tm is not None and text_weight > 0:
            rngs_t = {"dropout": jax.random.fold_in(rng, 2)}
            logits = model.apply(
                variables, tm["src_tokens"], tm["prev_tokens"],
                deterministic=False, rngs=rngs_t, method="forward_mt",
            )
            tgt_valid = tm["targets"] != mcfg.pad_id
            tsize = jnp.maximum(tgt_valid.sum(), 1)
            ce, _ = criterions.label_smoothed_ce(
                logits.astype(jnp.float32), tm["targets"], tgt_valid,
                jcfg.label_smoothing,
            )
            loss = loss + text_weight * ce * (sample_size / tsize)
            metrics["denoise_loss"] = ce
            metrics["denoise_acc"] = (
                ((logits.argmax(-1) == tm["targets"]) & tgt_valid).sum()
                / tsize
            )
        metrics["loss"] = loss
        metrics["sample_size"] = sample_size
        return loss, metrics

    return loss_fn
