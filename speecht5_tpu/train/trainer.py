"""Training loop: jitted/pjitted train step with optax.

Replaces the fairseq trainer harness the reference rides on (SURVEY.md L0):
- update loop with grad clipping, Adam, LR schedules (fairseq flags
  --lr/--warmup-updates/--clip-norm, SpeechT5/README.md:96-119);
- gradient accumulation (--update-freq) via a lax.scan over microbatches;
- distributed execution via jit + NamedSharding over a Mesh('data','model')
  instead of NCCL DDP: gradients are reduced by XLA-inserted psums over ICI.

The whole step (fwd, bwd, clip, update) is ONE compiled program.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.sharding import (
    make_mesh, params_shardings, batch_shardings, replicated,
)
from . import criterions
from .schedules import inverse_sqrt, tri_stage, polynomial_decay


def device_mel_batch(batch, n_mels: int, r: int):
    """Materialize TTS mel targets IN-GRAPH from the collator's reflect-padded
    target waveform (data/manifests.collate_mel_targets device mode).

    The fbank runs on device — the fused Pallas kernel on TPU
    (ops/pallas_kernels.fused_log_mel), the all-matmul XLA graph elsewhere —
    replacing the reference's per-utterance host librosa transform inside the
    dataset (reference data/text_to_speech_dataset.py:97-138).  center=False
    because each utterance was already reflect-padded on the host, so valid
    frames match the per-utterance transform exactly; frames past
    ``dec_lengths`` are zeroed to reproduce the host collator bit-for-bit.
    """
    if "tgt_wav" not in batch:
        return batch
    from ..ops.mel import device_log_mel

    batch = dict(batch)
    mel = device_log_mel(batch.pop("tgt_wav"), n_mels=n_mels, center=False)
    dec_len = batch["dec_lengths"]
    valid = jnp.arange(mel.shape[1])[None, :] < dec_len[:, None]
    mel = jnp.where(valid[:, :, None], mel, 0.0)
    thin = mel[:, r - 1 :: r]
    prev = jnp.concatenate(
        [jnp.zeros_like(thin[:, :1]), thin[:, :-1]], axis=1
    )
    valid_r = (jnp.arange(prev.shape[1])[None, :]
               < batch["dec_lengths_r"][:, None])
    batch["target_mel"] = mel
    batch["prev_mel"] = jnp.where(valid_r[:, :, None], prev, 0.0)
    if "src_wav" in batch:
        # SE decoder input: the r-thinned SOURCE fbank, also in-graph.  The
        # collator reflect-padded the source onto the TARGET's mel grid
        # (data/manifests.py se_mode device path); rows past the source's
        # own thinned frame count are zeroed to match the host collator.
        src = device_log_mel(batch.pop("src_wav"), n_mels=n_mels,
                             center=False)
        sthin = src[:, r - 1 :: r]
        n_thin = batch.pop("src_frames") // r
        valid_s = jnp.arange(sthin.shape[1])[None, :] < n_thin[:, None]
        batch["src_mel"] = jnp.where(valid_s[:, :, None], sthin, 0.0)
    return batch


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    warmup_steps: int = 25000
    schedule: str = "inverse_sqrt"   # inverse_sqrt | tri_stage | polynomial
    total_steps: int = 800000
    hold_steps: int = 0
    betas: tuple = (0.9, 0.98)
    adam_eps: float = 1e-8
    weight_decay: float = 0.01
    clip_norm: float = 5.0
    accum_steps: int = 1             # fairseq --update-freq
    # criterion weights
    ce_weight: float = 1.0
    ctc_weight: float = 0.0
    # reference --zero-infinity (SpeechT5/README.md:178): zero CTC loss for
    # samples with infeasible alignments instead of poisoning the step
    zero_infinity: bool = False
    label_smoothing: float = 0.1
    dec_weight: float = 1.0
    use_guided_attn: bool = False
    # freeze-for-N-updates fine-tuning (reference --freeze-encoder-updates /
    # --freeze-decoder-updates): while step < N the frozen sub-nets keep
    # their params AND optimizer moments unchanged, and contribute zero to
    # the grad norm — the functional equivalent of the reference running
    # them under torch.no_grad() (speech_encoder_prenet.py:151,
    # encoder.py:164-168, transformer_layer.py:289-291).  The CTC head
    # (encoder/proj) keeps training during an encoder freeze, as upstream.
    freeze_encoder_updates: int = 0
    freeze_decoder_updates: int = 0
    # encoder layer indices EXEMPT from the encoder freeze (reference
    # --no-freeze-encoder-layer, encoder.py:82-83,254: with the list set,
    # the freeze applies per-layer and the listed layers keep training;
    # the speech prenet stays frozen — it gates on its own copy of
    # freeze_encoder_updates, speech_encoder_prenet.py:151)
    no_freeze_encoder_layers: tuple = ()


def make_schedule(cfg: TrainConfig):
    if cfg.schedule == "inverse_sqrt":
        return inverse_sqrt(cfg.lr, cfg.warmup_steps)
    if cfg.schedule == "tri_stage":
        return tri_stage(
            cfg.lr, cfg.warmup_steps, cfg.hold_steps,
            max(cfg.total_steps - cfg.warmup_steps - cfg.hold_steps, 1),
        )
    return polynomial_decay(cfg.lr, cfg.warmup_steps, cfg.total_steps)


def make_optimizer(cfg: TrainConfig):
    sched = make_schedule(cfg)
    return optax.chain(
        # fairseq --clip-norm 0 disables clipping (clip_by_global_norm(0)
        # would instead zero every update)
        optax.clip_by_global_norm(cfg.clip_norm)
        if cfg.clip_norm > 0 else optax.identity(),
        optax.adamw(
            learning_rate=sched, b1=cfg.betas[0], b2=cfg.betas[1],
            eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
        ),
    )


class TrainState:
    """Minimal functional train state (a pytree)."""

    def __init__(self, params, opt_state, step, extra):
        self.params = params
        self.opt_state = opt_state
        self.step = step
        self.extra = extra  # e.g. batch_stats collection

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step, self.extra), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def _loss_for_task(model, task: str, cfg: TrainConfig,
                   deterministic: bool = False):
    mcfg = model.cfg
    det = deterministic

    def s2t(params, extra, batch, rng, step):
        variables = {"params": params, **extra}
        rngs = {"dropout": rng, "mask": jax.random.fold_in(rng, 1),
                "layerdrop": jax.random.fold_in(rng, 2)}
        logits, ctc_logits, enc_valid = model.apply(
            variables, batch["wav"], batch["wav_lengths"],
            batch["prev_tokens"], mask=not det, deterministic=det,
            rngs=rngs, method="forward_s2t",
        )
        loss, metrics = criterions.s2t_loss(
            logits, ctc_logits, enc_valid, batch["targets"],
            mcfg.pad_id, mcfg.blank_id, eos_id=mcfg.eos_id,
            ce_weight=cfg.ce_weight, ctc_weight=cfg.ctc_weight,
            label_smoothing=cfg.label_smoothing,
            zero_infinity=cfg.zero_infinity,
        )
        return loss, (metrics, extra)

    def t2s(params, extra, batch, rng, step):
        batch = device_mel_batch(batch, mcfg.n_mels, mcfg.reduction_factor)
        variables = {"params": params, **extra}
        rngs = {"dropout": rng, "prenet": jax.random.fold_in(rng, 1),
                "layerdrop": jax.random.fold_in(rng, 2)}
        out, updates = model.apply(
            variables, batch["tokens"], batch["prev_mel"],
            batch["dec_lengths_r"], batch.get("spkembs"),
            deterministic=det, rngs=rngs, mutable=["batch_stats"],
            method="forward_t2s",
        )
        before, after, stop_logits, attn = out
        enc_lengths = (batch["tokens"] != mcfg.pad_id).sum(-1)
        loss, metrics = criterions.tts_loss(
            before, after, stop_logits, batch["target_mel"],
            batch["dec_lengths"],
            reduction_factor=mcfg.reduction_factor,
            attn=attn, enc_lengths=enc_lengths,
            use_guided_attn=cfg.use_guided_attn,
        )
        return loss, (metrics, {**extra, **updates})

    def pretrain_speech(params, extra, batch, rng, step):
        batch = device_mel_batch(batch, mcfg.n_mels, mcfg.reduction_factor)
        variables = {"params": params, **extra}
        rngs = {"dropout": rng, "mask": jax.random.fold_in(rng, 1),
                "layerdrop": jax.random.fold_in(rng, 2),
                "prenet": jax.random.fold_in(rng, 3),
                "codebook": jax.random.fold_in(rng, 4),
                "gumbel": jax.random.fold_in(rng, 5)}
        out, updates = model.apply(
            variables, batch["wav"], batch["wav_lengths"], batch["prev_mel"],
            batch["dec_lengths_r"], batch.get("spkembs"),
            num_updates=step, deterministic=det, rngs=rngs,
            mutable=["batch_stats"], method="forward_pretrain_speech",
        )
        enc_lengths = out["valid_mask"].astype(jnp.int32).sum(-1)
        target_list = [batch["km_labels"]]
        loss, metrics = criterions.speech_pretrain_loss(
            out, target_list, batch["target_mel"], batch["dec_lengths"],
            enc_lengths, reduction_factor=mcfg.reduction_factor,
            dec_weight=cfg.dec_weight, use_guided_attn=cfg.use_guided_attn,
        )
        return loss, (metrics, {**extra, **updates})

    def s2s(params, extra, batch, rng, step):
        batch = device_mel_batch(batch, mcfg.n_mels, mcfg.reduction_factor)
        variables = {"params": params, **extra}
        rngs = {"dropout": rng, "prenet": jax.random.fold_in(rng, 1),
                "layerdrop": jax.random.fold_in(rng, 2)}
        out, updates = model.apply(
            variables, batch["wav"], batch["wav_lengths"], batch["prev_mel"],
            batch["dec_lengths_r"], batch.get("spkembs"),
            batch.get("src_mel"),
            deterministic=det, rngs=rngs, mutable=["batch_stats"],
            method="forward_s2s",
        )
        before, after, stop_logits, attn, enc_valid = out
        enc_lengths = enc_valid.astype(jnp.int32).sum(-1)
        loss, metrics = criterions.tts_loss(
            before, after, stop_logits, batch["target_mel"],
            batch["dec_lengths"],
            reduction_factor=mcfg.reduction_factor,
            attn=attn, enc_lengths=enc_lengths,
            use_guided_attn=cfg.use_guided_attn,
        )
        return loss, (metrics, {**extra, **updates})

    def s2c(params, extra, batch, rng, step):
        variables = {"params": params, **extra}
        rngs = {"dropout": rng, "mask": jax.random.fold_in(rng, 1),
                "layerdrop": jax.random.fold_in(rng, 2)}
        out, updates = model.apply(
            variables, batch["wav"], batch["wav_lengths"], batch["targets"],
            mask=False, deterministic=det, rngs=rngs,
            mutable=["batch_stats"], method="forward_s2c",
        )
        logits, _embed = out
        loss, metrics = criterions.sid_loss(
            logits, batch["targets"], label_smoothing=cfg.label_smoothing
        )
        return loss, (metrics, {**extra, **updates})

    def pretrain_text(params, extra, batch, rng, step):
        variables = {"params": params, **extra}
        rngs = {"dropout": rng, "layerdrop": jax.random.fold_in(rng, 1),
                "codebook": jax.random.fold_in(rng, 2),
                "gumbel": jax.random.fold_in(rng, 3)}
        out = model.apply(
            variables, batch["tokens"], batch["prev_tokens"],
            num_updates=step, deterministic=det, rngs=rngs,
            method="forward_pretrain_text",
        )
        loss, metrics = criterions.text_pretrain_loss(
            out, batch["targets"], mcfg.pad_id,
            label_smoothing=cfg.label_smoothing,
        )
        return loss, (metrics, extra)

    return {"s2t": s2t, "t2s": t2s, "s2s": s2s, "s2c": s2c,
            "pretrain_speech": pretrain_speech,
            "pretrain_text": pretrain_text}[task]


# sub-nets covered by the reference freeze flags (param-tree top-level keys
# of SpeechT5Model; other model families simply have no matching keys)
_ENC_FREEZE_TOPS = ("speech_encoder_prenet",)
_DEC_FREEZE_TOPS = (
    "decoder", "speech_decoder_prenet", "speech_decoder_postnet",
    "text_decoder_prenet", "text_decoder_postnet",
)


def _key_str(entry) -> str:
    return getattr(entry, "key", getattr(entry, "name", str(entry)))


def _freeze_horizons(params, cfg: TrainConfig):
    """Per-leaf freeze horizon N (0 = never frozen), mirroring ``params``.

    Encoder freeze covers the speech prenet and the shared encoder EXCEPT
    its CTC projection (reference keeps the CTC head outside no_grad,
    encoder.py:174-179); decoder freeze covers the shared decoder and all
    four decoder pre/postnets (each carries its own freeze_decoder_updates
    gate upstream)."""

    exempt = {f"layers_{i}" for i in cfg.no_freeze_encoder_layers}

    def horizon(path, _leaf):
        top = _key_str(path[0])
        if cfg.freeze_encoder_updates:
            if top in _ENC_FREEZE_TOPS:
                return cfg.freeze_encoder_updates
            if top == "encoder" and len(path) >= 2:
                second = _key_str(path[1])
                if second != "proj" and second not in exempt:
                    return cfg.freeze_encoder_updates
        if cfg.freeze_decoder_updates and top in _DEC_FREEZE_TOPS:
            return cfg.freeze_decoder_updates
        return 0

    return jax.tree_util.tree_map_with_path(horizon, params)


def make_train_step(model, task: str, cfg: TrainConfig):
    """Returns pure (state, batch, rng) -> (state, metrics)."""
    tx = make_optimizer(cfg)
    loss_fn = _loss_for_task(model, task, cfg)

    def step_fn(state: TrainState, batch, rng):
        def compute(params):
            return loss_fn(params, state.extra, batch, rng, state.step)

        if cfg.accum_steps > 1:
            # microbatch accumulation: batch leaves have a leading accum axis
            def micro(carry, mb):
                grads_acc, extra, rng = carry
                rng, sub = jax.random.split(rng)
                (loss, (metrics, new_extra)), grads = jax.value_and_grad(
                    lambda p: loss_fn(p, extra, mb, sub, state.step),
                    has_aux=True,
                )(state.params)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (grads_acc, new_extra, rng), (loss, metrics)

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, extra, _), (losses, metrics) = jax.lax.scan(
                micro, (zero, state.extra, rng), batch
            )
            grads = jax.tree_util.tree_map(
                lambda g: g / cfg.accum_steps, grads
            )
            metrics = jax.tree_util.tree_map(lambda m: m.mean(), metrics)
            loss = losses.mean()
        else:
            (loss, (metrics, extra)), grads = jax.value_and_grad(
                compute, has_aux=True
            )(state.params)

        horizons = _freeze_horizons(state.params, cfg)
        freeze_on = any(jax.tree_util.tree_leaves(horizons))
        if freeze_on:
            # zero frozen grads BEFORE clip/update so they don't contribute
            # to the grad norm (upstream: no_grad params produce no grads)
            grads = jax.tree_util.tree_map(
                lambda g, n: jnp.where(state.step < n, jnp.zeros_like(g), g)
                if n else g,
                grads, horizons,
            )

        updates, opt_state = tx.update(grads, state.opt_state, state.params)

        if freeze_on:
            # torch Adam initializes each param's step lazily on its first
            # grad, so a subtree released from a freeze at step N is
            # bias-corrected with count (step - N); optax keeps ONE global
            # count, which over-corrects fresh moments (~3x-large first
            # updates at torch betas).  Re-correct released subtrees with
            # their effective count.  The factor also transiently rescales
            # the weight-decay component by the same r in [~0.7, ~1.4] for
            # a few dozen steps — negligible next to the moment error.
            b1, b2 = cfg.betas
            t_g = (state.step + 1).astype(jnp.float32)

            def debias(u, n):
                if not n:
                    return u
                t_e = jnp.maximum(t_g - n, 1.0)
                r = ((1.0 - b1 ** t_g) / (1.0 - b1 ** t_e)
                     * jnp.sqrt((1.0 - b2 ** t_e) / (1.0 - b2 ** t_g)))
                return u * r

            updates = jax.tree_util.tree_map(debias, updates, horizons)

        params = optax.apply_updates(state.params, updates)

        if freeze_on:
            # keep frozen params and their Adam moments EXACTLY unchanged
            # (zero grads alone would still apply weight decay and decay the
            # moments); any opt-state subtree mirroring the param treedef is
            # moment-like and gets the same selection
            def select(new, old, n):
                return jnp.where(state.step < n, old, new) if n else new

            params = jax.tree_util.tree_map(
                select, params, state.params, horizons
            )
            p_treedef = jax.tree_util.tree_structure(state.params)

            def sel_opt(new_node, old_node):
                if jax.tree_util.tree_structure(new_node) == p_treedef:
                    return jax.tree_util.tree_map(
                        select, new_node, old_node, horizons
                    )
                if isinstance(new_node, tuple):
                    children = [
                        sel_opt(a, b) for a, b in zip(new_node, old_node)
                    ]
                    if hasattr(new_node, "_fields"):  # optax NamedTuples
                        return type(new_node)(*children)
                    return tuple(children)
                return new_node

            opt_state = sel_opt(opt_state, state.opt_state)

        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1, extra), metrics

    return step_fn


class Trainer:
    """Sharded training driver: one Mesh, pjitted step.

    ``task`` may be a single task name or a list for joint multitask
    pretraining: every task gets its own jitted step program, all donating
    and returning the SAME TrainState (one shared optimizer over modality-
    pure batches — the reference's MultitaskDataset + fairseq update
    semantics, SURVEY.md 2.1/3.1)."""

    def __init__(self, model, variables, task, cfg: TrainConfig,
                 mesh=None, fsdp: bool = False):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tasks = [task] if isinstance(task, str) else list(task)
        self.task = self.tasks[0]

        # deep-copy: train_step donates its state, and device_put may alias the
        # caller's buffers on the same device — without the copy the caller's
        # ``variables`` would be deleted after the first step
        params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), variables["params"]
        )
        extra = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True),
            {k: v for k, v in variables.items() if k != "params"},
        )
        tx = make_optimizer(cfg)
        opt_state = tx.init(params)
        self.state = TrainState(params, opt_state, jnp.zeros((), jnp.int32), extra)

        p_shard = params_shardings(params, self.mesh, fsdp)
        # Adam moments mirror the param tree: give any opt-state subtree with
        # the params' treedef the params' shardings (ZeRO-style when fsdp);
        # scalars (step counts) replicate.
        p_treedef = jax.tree_util.tree_structure(params)

        def opt_shard(node):
            if jax.tree_util.tree_structure(node) == p_treedef:
                return p_shard
            if isinstance(node, tuple):
                children = [opt_shard(c) for c in node]
                if hasattr(node, "_fields"):  # NamedTuple (optax states)
                    return type(node)(*children)
                return tuple(children)
            return jax.tree_util.tree_map(
                lambda x: replicated(self.mesh), node
            )

        self.state_shardings = TrainState(
            p_shard,
            opt_shard(opt_state),
            replicated(self.mesh),
            jax.tree_util.tree_map(lambda x: replicated(self.mesh), extra),
        )

        self._steps = {
            t: jax.jit(
                make_train_step(model, t, cfg),
                in_shardings=(self.state_shardings, None, None),
                out_shardings=(self.state_shardings, None),
                donate_argnums=(0,),
            )
            for t in self.tasks
        }
        self._step = self._steps[self.task]

        # place state according to shardings; under multi-host the shardings
        # span processes, so each host contributes its addressable shards of
        # the host-replicated init (device_put cannot cross processes)
        if jax.process_count() > 1:
            from ..parallel.distributed import host_to_global

            self.state = host_to_global(self.state, self.state_shardings)
        else:
            self.state = jax.device_put(self.state, self.state_shardings)

    def _put_batch(self, batch, bax: int):
        """Single-process: device_put with batch-axis sharding.  Multi-host:
        ``batch`` holds THIS process's contiguous row slice of the global
        batch (see distributed.process_rows) and the global array is
        assembled across hosts."""
        if jax.process_count() > 1:
            from ..parallel.distributed import make_global_batch

            return make_global_batch(batch, self.mesh, bax)
        return jax.device_put(batch, batch_shardings(batch, self.mesh, bax))

    def train_step(self, batch, rng, task: Optional[str] = None):
        # accum batches carry a leading microbatch axis: the data-parallel
        # split applies to axis 1 there
        bax = 1 if self.cfg.accum_steps > 1 else 0
        batch = self._put_batch(batch, bax)
        step = self._steps[task] if task is not None else self._step
        self.state, metrics = step(self.state, batch, rng)
        return metrics

    def eval_step(self, batch, rng=None):
        """Loss-only validation step (no grads, deterministic settings where
        the criterion allows).  For s2t it additionally returns the greedy
        CTC token ids so the caller can compute in-training WER/UER
        (the reference's valid-time WER, speech_to_text_loss.py:232-297)."""
        if not hasattr(self, "_eval_step"):
            if self.task == "s2t":
                # single forward: the same forward_s2t yields the loss AND the
                # greedy-CTC ids (no second encoder pass)
                mcfg = self.model.cfg
                tcfg = self.cfg

                def step_fn(params, extra, batch, rng):
                    variables = {"params": params, **extra}
                    logits, ctc_logits, enc_valid = self.model.apply(
                        variables, batch["wav"], batch["wav_lengths"],
                        batch["prev_tokens"], mask=False, deterministic=True,
                        method="forward_s2t",
                    )
                    _, metrics = criterions.s2t_loss(
                        logits, ctc_logits, enc_valid, batch["targets"],
                        mcfg.pad_id, mcfg.blank_id, eos_id=mcfg.eos_id,
                        ce_weight=tcfg.ce_weight,
                        ctc_weight=max(tcfg.ctc_weight, 1e-9),
                        label_smoothing=tcfg.label_smoothing,
                    )
                    out = dict(metrics)
                    out["_ctc_ids"] = jnp.argmax(ctc_logits, axis=-1)
                    out["_enc_lengths"] = enc_valid.astype(jnp.int32).sum(-1)
                    return out
            else:
                loss_fn = _loss_for_task(
                    self.model, self.task, self.cfg, deterministic=True
                )

                def step_fn(params, extra, batch, rng):
                    loss, (metrics, _) = loss_fn(
                        params, extra, batch, rng, jnp.zeros((), jnp.int32)
                    )
                    return dict(metrics)

            self._eval_step = jax.jit(step_fn)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        batch = self._put_batch(batch, 0)
        return self._eval_step(self.state.params, self.state.extra, batch, rng)
