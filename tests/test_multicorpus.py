"""Multi-corpus joint loader (reference MultiCorpusDataset,
speechlm/data/multimodal_corpus_dataset.py:24): each step yields one batch
per named corpus; shorter corpora cycle; deterministic and resumable."""

import numpy as np
import pytest

from speecht5_tpu.data.multicorpus import CorpusSpec, JointCorpusLoader


class ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _stack(items):
    return {"x": np.stack(items)}


def make_loader(seed=1):
    speech = ListDataset([np.full((4,), i, np.float32) for i in range(12)])
    mono = ListDataset([np.full((3,), 100 + i, np.int32) for i in range(5)])
    paired = ListDataset([np.full((2,), 200 + i, np.int32) for i in range(7)])
    specs = [
        CorpusSpec("speech", speech, _stack, batch_size=2),
        CorpusSpec("text_mono", mono, _stack, batch_size=2),
        CorpusSpec("text_paired", paired, _stack, batch_size=3),
    ]
    return JointCorpusLoader(specs, seed=seed)


class TestJointCorpusLoader:
    def test_every_step_has_all_corpora(self):
        loader = make_loader()
        # epoch length = largest corpus: 12 items / bs 2 = 6 steps
        assert len(loader) == 6
        steps = list(loader.iter_epoch(0))
        assert len(steps) == 6
        for _, joint in steps:
            assert set(joint) == {"speech", "text_mono", "text_paired"}
            assert joint["speech"]["x"].shape == (2, 4)
            assert joint["text_mono"]["x"].shape == (2, 3)
            assert joint["text_paired"]["x"].shape == (3, 2)

    def test_largest_corpus_covered_once(self):
        loader = make_loader()
        seen = []
        for _, joint in loader.iter_epoch(0):
            seen.extend(joint["speech"]["x"][:, 0].tolist())
        assert sorted(seen) == list(map(float, range(12)))

    def test_short_corpus_cycles(self):
        loader = make_loader()
        # mono has 5/2 = 2 batches for 6 steps -> each batch reused 3x
        batches = [tuple(j["text_mono"]["x"][:, 0]) for _, j in
                   loader.iter_epoch(0)]
        assert len(set(batches)) == 2
        assert batches[0] == batches[2] == batches[4]

    def test_deterministic_and_epoch_reshuffles(self):
        a = [j["speech"]["x"].tolist() for _, j in
             make_loader().iter_epoch(0)]
        b = [j["speech"]["x"].tolist() for _, j in
             make_loader().iter_epoch(0)]
        assert a == b
        c = [j["speech"]["x"].tolist() for _, j in
             make_loader().iter_epoch(1)]
        assert a != c

    def test_resume_mid_epoch(self):
        full = list(make_loader().iter_epoch(3))
        resumed = list(make_loader().iter_epoch(3, start_step=4))
        assert [s for s, _ in resumed] == [4, 5]
        for (s1, j1), (s2, j2) in zip(full[4:], resumed):
            assert s1 == s2
            for k in j1:
                np.testing.assert_array_equal(j1[k]["x"], j2[k]["x"])

    def test_rejects_corpus_smaller_than_batch(self):
        tiny = ListDataset([np.zeros(2)])
        with pytest.raises(ValueError, match="batch_size"):
            JointCorpusLoader([CorpusSpec("t", tiny, _stack, batch_size=2)])
