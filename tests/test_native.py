"""Native C++ data-loader parity tests (ctypes bindings, auto-built)."""

import numpy as np
import pytest

from speecht5_tpu.data.native import (
    available, batch_by_size_native, read_wav_batch_native,
    collate_tokens_native,
)
from speecht5_tpu.data.manifests import batch_by_size
from speecht5_tpu.data.audio import write_wav, read_wav

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")


class TestNative:
    def test_batch_by_size_parity(self, rng):
        sizes = rng.integers(100, 5000, 500)
        a = batch_by_size_native(sizes, 20000)
        b = batch_by_size(sizes, 20000)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_batch_by_size_max_sentences(self, rng):
        sizes = rng.integers(10, 100, 100)
        batches = batch_by_size_native(sizes, 100000, max_sentences=4)
        assert all(len(b) <= 4 for b in batches)
        got = sorted(int(i) for b in batches for i in b)
        assert got == list(range(100))

    def test_wav_batch(self, tmp_path, rng):
        paths = []
        for i in range(3):
            w = np.clip(rng.standard_normal(4000 + i * 500) * 0.2, -1, 1)
            p = str(tmp_path / f"x{i}.wav")
            write_wav(p, w)
            paths.append(p)
        out, lengths = read_wav_batch_native(paths, 6000)
        assert lengths.tolist() == [4000, 4500, 5000]
        ref, _ = read_wav(paths[1])
        np.testing.assert_allclose(out[1, :4500], ref, atol=1e-6)
        # zero padding beyond length
        assert (out[0, 4000:] == 0).all()

    def test_wav_batch_missing_file(self, tmp_path):
        out, lengths = read_wav_batch_native([str(tmp_path / "nope.wav")], 100)
        assert lengths[0] == -1

    def test_collate_tokens(self):
        tgt, prev = collate_tokens_native(
            [np.array([5, 6, 7, 2]), np.array([8, 9, 2])], 6, pad_id=1, eos_id=2
        )
        assert tgt[0].tolist() == [5, 6, 7, 2, 1, 1]
        assert prev[0].tolist() == [2, 5, 6, 7, 1, 1]
        assert prev[1].tolist() == [2, 8, 9, 1, 1, 1]
