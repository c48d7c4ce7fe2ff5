"""Checkpoint save/load/resume (orbax) + fine-tune warm start.

Replaces fairseq checkpoint_utils (SURVEY.md section 5.4):
- periodic async save of the full train state (params, opt state, step,
  batch_stats, data-iterator position) — the deterministic iterator state makes
  resume exact, which the reference cannot do;
- non-strict partial load for fine-tuning (--finetune-from-model semantics,
  reference models/speecht5.py:1022-1058): module-filtered, dictionary-size
  mismatch pruning;
- checkpoint averaging (reference README ST recipes average the last 10).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Interval checkpoints (keep last ``max_to_keep``) plus, when
    ``best_metric`` is set, a separate ``best/`` checkpoint updated whenever
    a validation improves the tracked metric — fairseq's
    ``--best-checkpoint-metric`` / ``checkpoint_best.pt`` +
    ``--keep-last-epochs`` behavior (reference SpeechT5/README.md:119,205,208).
    The best value survives resume via a JSON item in the best checkpoint."""

    def __init__(self, directory: str, max_to_keep: int = 10,
                 save_interval_steps: int = 1,
                 best_metric: Optional[str] = None,
                 maximize_best: bool = False):
        ocp = _ocp()
        from orbax.checkpoint import options as ocp_options

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
                multiprocessing_options=ocp_options.MultiprocessingOptions(
                    barrier_sync_key_prefix="interval",
                ),
            ),
        )
        self.best_metric = best_metric
        self.maximize_best = maximize_best
        self.best_value: Optional[float] = None
        self.best_step: Optional[int] = None
        self.best_mngr = None
        if best_metric:
            self.best_mngr = ocp.CheckpointManager(
                os.path.join(self.directory, "best"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, enable_async_checkpointing=True,
                    # distinct barrier namespace: two async managers in one
                    # multi-host job must not alias their sync keys
                    multiprocessing_options=(
                        ocp_options.MultiprocessingOptions(
                            barrier_sync_key_prefix="best",
                        )
                    ),
                ),
            )
            prev = self.best_mngr.latest_step()
            if prev is not None:  # resumed run: recover the incumbent best
                try:
                    meta = self.best_mngr.restore(
                        prev, args=ocp.args.Composite(
                            best=ocp.args.JsonRestore())
                    )["best"]
                    if meta.get("metric") == best_metric:
                        self.best_value = float(meta["value"])
                        self.best_step = int(prev)
                except Exception:
                    pass

    def is_best(self, metrics: Dict[str, float]) -> bool:
        if not self.best_metric or self.best_metric not in metrics:
            return False
        v = float(metrics[self.best_metric])
        if self.best_value is None:
            return True
        return v > self.best_value if self.maximize_best else v < self.best_value

    def save_best(self, step: int, metrics: Dict[str, float], state=None,
                  data_state: Optional[dict] = None,
                  model: Optional[dict] = None) -> bool:
        """Update ``best/`` if ``metrics[best_metric]`` improves.  Returns
        whether this step became the new best."""
        if not self.is_best(metrics):
            return False
        ocp = _ocp()
        self.best_value = float(metrics[self.best_metric])
        self.best_step = step
        items = {"best": ocp.args.JsonSave({
            "metric": self.best_metric, "value": self.best_value,
            "step": step})}
        if state is not None:
            items["state"] = ocp.args.StandardSave(state)
        if data_state is not None:
            items["data"] = ocp.args.JsonSave(data_state)
        if model is not None:
            items["model"] = ocp.args.StandardSave(model)
        self.best_mngr.save(step, args=ocp.args.Composite(**items))
        return True

    def restore_best_model(self, variables_template):
        """Restore the weights item of the best checkpoint (None if absent)."""
        if self.best_mngr is None:
            return None, None
        step = self.best_mngr.latest_step()
        if step is None:
            return None, None
        ocp = _ocp()
        restored = self.best_mngr.restore(
            step, args=ocp.args.Composite(
                model=ocp.args.StandardRestore(variables_template)),
        )
        return restored["model"], step

    def save(self, step: int, state, data_state: Optional[dict] = None,
             model: Optional[dict] = None):
        """``model``: a plain variables dict (params + batch_stats) saved as a
        separate item so inference can restore weights without rebuilding the
        optimizer state template."""
        ocp = _ocp()
        items = {"state": ocp.args.StandardSave(state)}
        if data_state is not None:
            items["data"] = ocp.args.JsonSave(data_state)
        if model is not None:
            items["model"] = ocp.args.StandardSave(model)
        self.mngr.save(step, args=ocp.args.Composite(**items))

    def restore(self, state_template, step: Optional[int] = None):
        ocp = _ocp()
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None, None, None
        restored = self.mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
            ),
        )
        data = None
        try:
            restored_d = self.mngr.restore(
                step, args=ocp.args.Composite(data=ocp.args.JsonRestore())
            )
            data = restored_d.get("data")
        except Exception:
            pass
        return restored["state"], data, step

    def save_model_only(self, step: int, model: dict):
        """Save just the weights item (converter output, no train state)."""
        ocp = _ocp()
        self.mngr.save(
            step, args=ocp.args.Composite(model=ocp.args.StandardSave(model))
        )

    def restore_model(self, variables_template, step: Optional[int] = None):
        """Restore just the weights item saved via ``save(..., model=...)``."""
        ocp = _ocp()
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None, None
        restored = self.mngr.restore(
            step,
            args=ocp.args.Composite(
                model=ocp.args.StandardRestore(variables_template),
            ),
        )
        return restored["model"], step

    def wait(self):
        self.mngr.wait_until_finished()
        if self.best_mngr is not None:
            self.best_mngr.wait_until_finished()


def partial_load(
    target_params: dict,
    source_params: dict,
    include_modules: Optional[List[str]] = None,
    exclude_modules: Optional[List[str]] = None,
    strict_shapes: bool = False,
) -> dict:
    """Merge source into target, module-filtered; shape mismatches keep the
    target's (freshly initialized) value — mirroring the reference's
    dictionary-mismatch pruning (models/speecht5.py:1036-1051) and
    --finetune-from-modules / --finetune-out-of-modules (tasks/speecht5.py:93-113)."""

    def merge(tgt, src, path):
        if not isinstance(tgt, dict):
            if src is None:
                return tgt
            if np.shape(src) != np.shape(tgt):
                if strict_shapes:
                    raise ValueError(f"shape mismatch at {path}: "
                                     f"{np.shape(src)} vs {np.shape(tgt)}")
                return tgt
            return np.asarray(src)
        out = {}
        for k, v in tgt.items():
            p = f"{path}/{k}" if path else k
            top = p.split("/")[0]
            if include_modules and top not in include_modules:
                out[k] = v
                continue
            if exclude_modules and top in exclude_modules:
                out[k] = v
                continue
            out[k] = merge(v, src.get(k) if isinstance(src, dict) else None, p)
        return out

    return merge(target_params, source_params, "")


# per-fine-tune-task module pruning (reference models/speecht5.py:1060-1120
# prune_modules + --modules-filter): sub-nets a task never touches are dropped
# from the checkpoint so fine-tuned artifacts stay small.
TASK_MODULES = {
    "s2t": ("speech_encoder_prenet", "encoder", "decoder",
            "text_decoder_prenet", "text_decoder_postnet"),
    "t2s": ("text_encoder_prenet", "encoder", "decoder",
            "speech_decoder_prenet", "speech_decoder_postnet"),
    "s2s": ("speech_encoder_prenet", "encoder", "decoder",
            "speech_decoder_prenet", "speech_decoder_postnet"),
    "s2c": ("speech_encoder_prenet", "encoder", "decoder",
            "text_decoder_prenet", "speaker_decoder_postnet"),
}


def prune_for_task(variables: dict, task: str) -> dict:
    """Drop top-level modules the fine-tune task never uses."""
    keep = TASK_MODULES[task]
    out = {}
    for coll, tree in variables.items():
        if not isinstance(tree, dict):
            out[coll] = tree
            continue
        out[coll] = {k: v for k, v in tree.items() if k in keep}
    return out


def average_checkpoints(param_trees: List[dict]) -> dict:
    """Uniform parameter averaging (reference Speech2S/speech2s/scripts/
    average_checkpoints.py semantics)."""
    n = len(param_trees)
    return jax.tree_util.tree_map(
        lambda *xs: sum(np.asarray(x, np.float64) for x in xs).astype(
            np.asarray(xs[0]).dtype
        ) / n,
        *param_trees,
    )
