"""Multi-corpus joint batching for SpeechLM/SpeechUT-style pretraining.

Behavioral spec from reference SpeechLM/speechlm/data/multimodal_corpus_dataset.py:24
(MultiCorpusDataset) + tasks/joint_sc2t_pretrain.py:705-860: named sub-corpora
(speech with labels, mono units/text, paired unit<->text) whose batches are
combined so ONE training update sees a heterogeneous sample
{speech, text_mono, text_paired} — the multi-forward joint criterion
(train/joint.py) consumes exactly that dict.

TPU-first departures: every sub-corpus is batched to its own FIXED batch size
(static shapes; the reference max-token-batches vary), shorter corpora cycle,
and the whole schedule is a deterministic, seedable, resumable function of
(seed, epoch) — the reference's iterator state is not resumable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Sequence

import numpy as np


@dataclass
class CorpusSpec:
    name: str                # key in the joint batch dict
    dataset: object          # indexable, len()
    collate: Callable        # items -> batch dict
    batch_size: int


class JointCorpusLoader:
    """Yields {corpus_name: collated_batch} per step, one entry per corpus."""

    def __init__(self, specs: Sequence[CorpusSpec], seed: int = 1,
                 steps_per_epoch: Optional[int] = None):
        self.specs = list(specs)
        self.seed = seed
        n_batches = [len(s.dataset) // s.batch_size for s in self.specs]
        for s, n in zip(self.specs, n_batches):
            if n == 0:
                raise ValueError(
                    f"corpus '{s.name}' has {len(s.dataset)} items < "
                    f"batch_size {s.batch_size}"
                )
        # an epoch covers the LARGEST corpus once; shorter corpora cycle
        self.steps_per_epoch = steps_per_epoch or max(n_batches)

    def _epoch_orders(self, epoch: int) -> Dict[str, np.ndarray]:
        orders = {}
        for ci, s in enumerate(self.specs):
            rng = np.random.default_rng(self.seed + 1009 * epoch + ci)
            orders[s.name] = rng.permutation(len(s.dataset))
        return orders

    def __len__(self):
        return self.steps_per_epoch

    def iter_epoch(self, epoch: int, start_step: int = 0):
        """Deterministic + resumable: step i of epoch e always yields the
        same joint batch."""
        orders = self._epoch_orders(epoch)
        for step in range(start_step, self.steps_per_epoch):
            joint = {}
            for s in self.specs:
                order = orders[s.name]
                n_batches = len(order) // s.batch_size
                b = step % n_batches
                idxs = order[b * s.batch_size : (b + 1) * s.batch_size]
                items = [s.dataset[int(i)] for i in idxs]
                joint[s.name] = s.collate(items)
            yield step, joint
