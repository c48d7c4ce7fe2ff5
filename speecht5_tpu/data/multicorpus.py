"""Multi-corpus joint batching for SpeechLM/SpeechUT-style pretraining.

Behavioral spec from reference SpeechLM/speechlm/data/multimodal_corpus_dataset.py:24
(MultiCorpusDataset) + tasks/joint_sc2t_pretrain.py:705-860: named sub-corpora
(speech with labels, mono units/text, paired unit<->text) whose batches are
combined so ONE training update sees a heterogeneous sample
{speech, text_mono, text_paired} — the multi-forward joint criterion
(train/joint.py) consumes exactly that dict.

TPU-first departures: token-budget batch sizes are rounded down to a bounded
grid of static shapes (the reference's max-token batches are fully dynamic),
and the whole schedule is a deterministic, seedable, resumable function of
(seed, epoch) — the reference's iterator state is not resumable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Reference-faithful ratio/token-budget sampling (MultiCorpusDataset parity)
# ---------------------------------------------------------------------------

#: default grid for rounding token-budget batch sizes down to a bounded set of
#: static shapes (the TPU substitute for fairseq's fully dynamic batch sizes)
BATCH_SIZE_GRID = (1, 2, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)


@dataclass
class TokenCorpusSpec:
    """A named sub-corpus batched by a max-token budget.

    Mirrors reference multimodal_corpus_dataset.py:38-56 constructor
    semantics: ``sample_ratio`` is the corpus's entry in ``distribution``
    (instances drawn per epoch = sample_ratio * total instances across
    corpora, oversampling with full copies + a random remainder,
    reference :82-112), and ``max_tokens_ratio`` scales the global
    ``max_tokens`` budget for this corpus's batches (reference :387-416,
    tasks/joint_sc2t_pretrain.py:902-908 — text corpora get
    1/320/text_maxtokens_ratio of the speech budget).
    """

    name: str
    dataset: object            # indexable, len()
    collate: Callable          # items -> batch dict
    sizes: np.ndarray          # per-item size in tokens/samples/frames
    sample_ratio: float = 1.0
    max_tokens_ratio: float = 1.0
    #: batches from corpora sharing a stream alternate in ONE slot of the
    #: joint batch (the reference concatenates all "speech*" corpora into a
    #: single stream, multimodal_corpus_dataset.py:296-310); defaults to
    #: "speech" for speech-prefixed names, else the corpus name.
    stream: Optional[str] = None

    def __post_init__(self):
        self.sizes = np.asarray(self.sizes, np.int64)
        assert len(self.sizes) == len(self.dataset)
        if self.stream is None:
            self.stream = "speech" if self.name.startswith("speech") else self.name


def _grid_floor(n: int, grid: Sequence[int]) -> int:
    out = 0
    for g in grid:
        if g <= n:
            out = g
    return out


def _inner_bucket_shuffle(batches: List[np.ndarray], rng, bucket: int = 10):
    """Shuffle samples WITHIN groups of ``bucket`` length-sorted batches
    (reference inner_bucket_shuffle, multimodal_corpus_dataset.py:335-356):
    keeps length locality (padding efficiency) while decorrelating samples."""
    out: List[np.ndarray] = []
    i = 0
    while i < len(batches):
        group = batches[i : i + bucket]
        flat = np.concatenate(group)
        rng.shuffle(flat)
        splits = np.cumsum([len(b) for b in group])[:-1]
        out.extend(np.array_split(flat, splits))
        i += bucket
    return out


class MultiCorpusLoader:
    """Joint loader with the reference's ratio-resampled, max-token-scaled
    batch semantics (reference MultiCorpusDataset.ordered_indices:77-150,
    batch_by_size:387-416, get_batch_sampler:270-369), deterministic and
    resumable as a pure function of (seed, epoch, step).

    Per epoch: each corpus draws ``sample_ratio * total_instances`` item
    indices (full copies + random remainder), batches them under
    ``max_tokens * max_tokens_ratio``, inner-bucket-shuffles, then corpora
    sharing a ``stream`` concatenate and the epoch yields
    ``min(len(stream_batches))`` joint steps of ``{stream: batch}``.

    TPU-first departures: item lengths are padded by the corpus collators to
    bucket grids and batch sizes are rounded DOWN to ``batch_size_grid``, so
    the number of distinct jit shapes stays bounded (the reference's fully
    dynamic shapes would recompile XLA programs indefinitely).
    """

    def __init__(
        self,
        specs: Sequence[TokenCorpusSpec],
        max_tokens: int,
        seed: int = 1,
        max_sentences: Optional[int] = None,
        batch_size_grid: Optional[Sequence[int]] = BATCH_SIZE_GRID,
        inner_bucket: int = 10,
    ):
        self.specs = list(specs)
        assert self.specs, "need at least one corpus"
        names = [s.name for s in self.specs]
        assert len(set(names)) == len(names), f"duplicate corpus names: {names}"
        self.max_tokens = max_tokens
        self.seed = seed
        self.max_sentences = max_sentences
        self.batch_size_grid = (
            tuple(batch_size_grid) if batch_size_grid else None
        )
        self.inner_bucket = inner_bucket
        self.total_instances = sum(len(s.dataset) for s in self.specs)

    # ------------------------------------------------------------- sampling

    def _sample_indices(self, spec: TokenCorpusSpec, rng) -> np.ndarray:
        """distribution-resampled indices for one corpus
        (reference ordered_indices:82-112: k full copies + random remainder)."""
        n = len(spec.dataset)
        num_instances = int(spec.sample_ratio * self.total_instances)
        num_instances = max(num_instances, 1)
        num_copies = num_instances // n
        idx = rng.permutation(n)[: num_instances - num_copies * n]
        if num_copies > 0:
            idx = np.concatenate([np.repeat(np.arange(n), num_copies), idx])
        rng.shuffle(idx)
        return idx.astype(np.int64)

    def _corpus_batches(self, spec: TokenCorpusSpec, rng) -> List[np.ndarray]:
        from .manifests import batch_by_size

        idx = self._sample_indices(spec, rng)
        budget = max(int(round(self.max_tokens * spec.max_tokens_ratio)),
                     int(spec.sizes.max()))
        batches = batch_by_size(
            spec.sizes[idx], budget, max_sentences=self.max_sentences
        )
        batches = [idx[b] for b in batches]
        if self.batch_size_grid is not None:
            # round batch size down to the grid by dropping a RANDOM subset
            # (tail-dropping would systematically drop duplicated copies of
            # equal-sized items, which sort adjacently)
            out = []
            for b in batches:
                keep = _grid_floor(len(b), self.batch_size_grid)
                if keep == 0:
                    continue
                out.append(b[rng.permutation(len(b))[:keep]] if keep < len(b)
                           else b)
            batches = out
        return _inner_bucket_shuffle(batches, rng, self.inner_bucket)

    def epoch_plan(self, epoch: int) -> Tuple[Dict[str, List], int]:
        """streams: {stream_name: [(spec, indices), ...]}, plus the number of
        joint steps (= min stream length, reference :323-329)."""
        streams: Dict[str, List] = {}
        for ci, spec in enumerate(self.specs):
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, ci])
            )
            for b in self._corpus_batches(spec, rng):
                streams.setdefault(spec.stream, []).append((spec, b))
        # shuffle batch order within each stream (shuffle_buckets with
        # inner_shuf=False, reference :358-369); speech corpora are already
        # merged by the shared stream key
        for si, (name, blist) in enumerate(sorted(streams.items())):
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, 7919 + si])
            )
            order = rng.permutation(len(blist))
            streams[name] = [blist[i] for i in order]
        n_steps = min(len(b) for b in streams.values())
        return streams, n_steps

    def steps_per_epoch(self, epoch: int) -> int:
        return self.epoch_plan(epoch)[1]

    def iter_epoch(self, epoch: int, start_step: int = 0):
        """Yield (step, {stream_name: collated_batch}).  Deterministic and
        resumable: step i of epoch e always yields the same joint batch."""
        streams, n_steps = self.epoch_plan(epoch)
        for step in range(start_step, n_steps):
            joint = {}
            for name, blist in streams.items():
                spec, idxs = blist[step]
                joint[name] = spec.collate([spec.dataset[int(i)] for i in idxs])
            yield step, joint
