"""Multi-corpus joint loader (reference MultiCorpusDataset,
speechlm/data/multimodal_corpus_dataset.py:24): each step yields one batch
per named corpus; shorter corpora cycle; deterministic and resumable."""

import numpy as np
import pytest



class ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


# ---------------------------------------------------------------------------
# MultiCorpusLoader: reference ratio/token-budget semantics
# (reference multimodal_corpus_dataset.py:77-150, :387-416, :270-369)
# ---------------------------------------------------------------------------

from speecht5_tpu.data.multicorpus import MultiCorpusLoader, TokenCorpusSpec


def _ids(items):
    return {"ids": np.stack([np.asarray(i) for i in items])}


def make_token_loader(seed=1, **kw):
    # speech: 40 items of varying size; text: 60 items
    rng = np.random.default_rng(0)
    speech_sizes = rng.integers(80, 320, 40)
    text_sizes = rng.integers(8, 32, 60)
    speech = ListDataset([np.full((1,), i, np.int64) for i in range(40)])
    text = ListDataset([np.full((1,), 1000 + i, np.int64) for i in range(60)])
    specs = [
        TokenCorpusSpec("speech", speech, _ids, speech_sizes,
                        sample_ratio=kw.pop("speech_ratio", 0.4)),
        TokenCorpusSpec("text_mono", text, _ids, text_sizes,
                        sample_ratio=kw.pop("text_ratio", 0.6),
                        max_tokens_ratio=kw.pop("text_mt_ratio", 0.1)),
    ]
    return MultiCorpusLoader(specs, max_tokens=kw.pop("max_tokens", 1200),
                             seed=seed, **kw), speech_sizes, text_sizes


class TestMultiCorpusLoader:
    def test_sample_ratio_composition(self):
        """Per-epoch instance counts follow sample_ratio * total_instances
        (reference ordered_indices:88-97)."""
        loader, _, _ = make_token_loader()
        streams, _ = loader.epoch_plan(0)
        total = loader.total_instances  # 100
        n_speech = sum(len(b) for _, b in streams["speech"])
        n_text = sum(len(b) for _, b in streams["text_mono"])
        # grid rounding may drop a few items per batch; allow 15% slack below
        assert n_speech <= int(0.4 * total)
        assert n_speech >= int(0.4 * total * 0.85)
        assert n_text <= int(0.6 * total)
        assert n_text >= int(0.6 * total * 0.85)

    def test_oversampling_with_copies(self):
        """sample_ratio > len(ds)/total duplicates items via full copies
        (reference :99-112): every item appears >= num_copies times."""
        loader, _, _ = make_token_loader(speech_ratio=1.2)
        streams, _ = loader.epoch_plan(0)
        seen = np.concatenate([b for _, b in streams["speech"]])
        # 1.2 * 100 = 120 instances over 40 items -> 3 full copies
        counts = np.bincount(seen, minlength=40)
        assert counts.min() >= 1  # grid rounding can drop a couple of copies
        assert counts.mean() >= 2.5
        assert len(seen) > 100

    def test_max_tokens_ratio_budget(self):
        """Every batch's cost (max_size * n_items) respects the scaled token
        budget (reference batch_by_size:387-416).  inner_bucket=1 disables
        the cross-batch sample shuffle (which, as in the reference's
        inner_bucket_shuffle, can move a longer item into a neighbouring
        batch) so the budget invariant is exact."""
        loader, speech_sizes, text_sizes = make_token_loader(inner_bucket=1)
        streams, _ = loader.epoch_plan(0)
        for _, b in streams["speech"]:
            assert speech_sizes[b].max() * len(b) <= 1200
        for _, b in streams["text_mono"]:
            # text budget = 1200 * 0.1 = 120 (>= max single size 31)
            assert text_sizes[b].max() * len(b) <= 120
        # the scaled budget actually bites: text batches are small
        text_bs = [len(b) for _, b in streams["text_mono"]]
        assert max(text_bs) <= 120 // 8

    def test_speech_streams_merge(self):
        """Corpora named speech* share one stream slot
        (reference get_batch_sampler:296-310)."""
        rng = np.random.default_rng(0)
        ds_a = ListDataset([np.full((1,), i) for i in range(20)])
        ds_b = ListDataset([np.full((1,), 100 + i) for i in range(20)])
        txt = ListDataset([np.full((1,), 200 + i) for i in range(20)])
        loader = MultiCorpusLoader([
            TokenCorpusSpec("speech_km", ds_a, _ids, rng.integers(50, 99, 20)),
            TokenCorpusSpec("speech_ltr", ds_b, _ids, rng.integers(50, 99, 20)),
            TokenCorpusSpec("text_mono", txt, _ids, rng.integers(50, 99, 20)),
        ], max_tokens=400, seed=3)
        streams, n = loader.epoch_plan(0)
        assert set(streams) == {"speech", "text_mono"}
        sources = set()
        for _, joint in loader.iter_epoch(0):
            assert set(joint) == {"speech", "text_mono"}
            v = int(joint["speech"]["ids"].ravel()[0])
            sources.add("km" if v < 100 else "ltr")
        assert sources == {"km", "ltr"}  # both corpora alternate in the slot

    def test_deterministic_and_resumable(self):
        la, _, _ = make_token_loader(seed=5)
        lb, _, _ = make_token_loader(seed=5)
        full = [(s, {k: v["ids"].tolist() for k, v in j.items()})
                for s, j in la.iter_epoch(2)]
        again = [(s, {k: v["ids"].tolist() for k, v in j.items()})
                 for s, j in lb.iter_epoch(2)]
        assert full == again
        resumed = [(s, {k: v["ids"].tolist() for k, v in j.items()})
                   for s, j in lb.iter_epoch(2, start_step=3)]
        assert resumed == full[3:]
        other_epoch = [(s, {k: v["ids"].tolist() for k, v in j.items()})
                       for s, j in lb.iter_epoch(3)]
        assert [j for _, j in other_epoch[:3]] != [j for _, j in full[:3]]

    def test_batch_size_grid_bounds_shapes(self):
        loader, _, _ = make_token_loader()
        streams, _ = loader.epoch_plan(0)
        from speecht5_tpu.data.multicorpus import BATCH_SIZE_GRID
        for blist in streams.values():
            for _, b in blist:
                assert len(b) in BATCH_SIZE_GRID
