"""Ratio-balanced multitask batch scheduling.

Behavioral spec from reference data/multitask_dataset.py:21-265 (MultitaskDataset):
batches stay modality-pure (a batch is all-speech or all-text); each sub-dataset
is batched with its own max-token budget scaled by ``batch_ratio``; batch lists
are resampled by ``sample_ratios`` and interleaved.  Here the schedule is a
deterministic, seedable, resumable permutation of (dataset_idx, batch_idx)
pairs — the reference uses np.random.choice at iteration time
(multitask_dataset.py:173), which is neither deterministic nor resumable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


@dataclass
class TaskSpec:
    name: str
    dataset: object                  # indexable with .sizes
    collate: Callable                # items -> batch dict
    max_tokens: int
    sample_ratio: float = 1.0


class MultitaskLoader:
    """Deterministic interleaved loader over several task datasets."""

    def __init__(self, specs: Sequence[TaskSpec], seed: int = 1,
                 max_sentences: Optional[int] = None):
        from .manifests import batch_by_size

        self.specs = list(specs)
        self.seed = seed
        self._batches: List[tuple] = []  # (spec_idx, np.ndarray of item idxs)
        for si, spec in enumerate(self.specs):
            bs = batch_by_size(
                np.asarray(spec.dataset.sizes), spec.max_tokens, max_sentences
            )
            reps = spec.sample_ratio
            n = int(len(bs) * reps)
            idxs = (np.arange(n) % len(bs)).tolist()
            self._batches.extend((si, bs[i]) for i in idxs)

    def epoch_schedule(self, epoch: int) -> List[tuple]:
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self._batches))
        return [self._batches[i] for i in order]

    def iter_epoch(self, epoch: int, start_batch: int = 0):
        """Yields (task_name, batch dict).  ``start_batch`` resumes mid-epoch
        deterministically (checkpoint/resume support the reference lacks —
        SURVEY.md section 5.3)."""
        sched = self.epoch_schedule(epoch)
        for bi in range(start_batch, len(sched)):
            si, item_idxs = sched[bi]
            spec = self.specs[si]
            items = [spec.dataset[int(i)] for i in item_idxs]
            yield spec.name, spec.collate(items)

    def __len__(self):
        return len(self._batches)
