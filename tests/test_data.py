"""Data layer tests: dictionary, wav io, manifests/collation, batching,
BART noising, multitask scheduling, metrics."""

import os

import numpy as np
import pytest

from speecht5_tpu.data.dictionary import Dictionary, letters_to_text
from speecht5_tpu.data.audio import read_wav, write_wav, layer_norm_wav
from speecht5_tpu.data.manifests import (
    SpeechToTextDataset, TextToSpeechDataset, batch_by_size, bucket_length,
)
from speecht5_tpu.data.text_noising import NoisingConfig, noise_tokens
from speecht5_tpu.data.multitask import MultitaskLoader, TaskSpec
from speecht5_tpu.utils.metrics import edit_distance, wer, corpus_wer, mcd


@pytest.fixture
def workdir(tmp_path, rng):
    # 4 synthetic wavs + manifest + letter labels + dict
    root = tmp_path / "audio"
    root.mkdir()
    sizes = [8000, 12000, 6000, 16000]
    for i, n in enumerate(sizes):
        write_wav(str(root / f"utt{i}.wav"), rng.standard_normal(n) * 0.1)
    man = tmp_path / "train.tsv"
    with open(man, "w") as f:
        f.write(str(root) + "\n")
        for i, n in enumerate(sizes):
            f.write(f"utt{i}.wav\t{n}\n")
    labels = tmp_path / "train.ltr"
    with open(labels, "w") as f:
        f.write("H E L L O | W O R L D |\n" * 4)
    dpath = tmp_path / "dict.ltr.txt"
    with open(dpath, "w") as f:
        for s in "| E T A H L O W R D".split():
            f.write(f"{s} 100\n")
    return tmp_path, man, labels, dpath


class TestDictionary:
    def test_load_and_specials(self, workdir):
        _, _, _, dpath = workdir
        d = Dictionary.load(str(dpath), extra_special_symbols=["<mask>", "<ctc_blank>"])
        assert d.bos_index == 0 and d.pad_index == 1
        assert d.eos_index == 2 and d.unk_index == 3
        assert d.index("|") == 4
        assert d.index("<mask>") == len(d) - 2
        assert d.index("zzz") == d.unk_index

    def test_encode_decode_round_trip(self, workdir):
        _, _, _, dpath = workdir
        d = Dictionary.load(str(dpath))
        ids = d.encode_line("H E L L O |")
        assert ids[-1] == d.eos_index
        assert d.string(ids) == "H E L L O |"
        assert letters_to_text("H E L L O | W O R L D |") == "HELLO WORLD"


class TestAudio:
    def test_wav_round_trip(self, tmp_path, rng):
        x = np.clip(rng.standard_normal(5000) * 0.3, -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / "a.wav")
        write_wav(p, x)
        y, sr = read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(x, y, atol=1e-4)

    def test_layer_norm(self, rng):
        x = rng.standard_normal(1000).astype(np.float32) * 3 + 2
        y = layer_norm_wav(x)
        assert abs(y.mean()) < 1e-4 and abs(y.std() - 1) < 1e-3


class TestBatching:
    def test_batch_by_size_budget(self):
        sizes = np.asarray([10, 20, 30, 40, 50, 60])
        batches = batch_by_size(sizes, max_tokens=90)
        for b in batches:
            mx = sizes[b].max()
            assert mx * len(b) <= 90
        got = sorted(int(i) for b in batches for i in b)
        assert got == list(range(6))

    def test_bucket(self):
        assert bucket_length(5, (8, 16)) == 8
        assert bucket_length(9, (8, 16)) == 16
        assert bucket_length(99, (8, 16)) == 16


class TestS2TDataset:
    def test_collate_shapes(self, workdir):
        _, man, labels, dpath = workdir
        d = Dictionary.load(str(dpath))
        ds = SpeechToTextDataset(str(man), str(labels), d)
        assert len(ds) == 4
        items = [ds[0], ds[1]]
        batch = ds.collate(items, eos_id=2, pad_id=1)
        assert batch["wav"].shape[0] == 2
        assert batch["wav"].shape[1] >= 12000
        assert batch["prev_tokens"][0, 0] == 2  # EOS-shifted BOS
        # prev is targets shifted right by one
        np.testing.assert_array_equal(
            batch["prev_tokens"][0, 1:5], batch["targets"][0, :4]
        )
        assert batch["wav_lengths"].tolist() == [8000, 12000]


class TestT2SDataset:
    def test_collate_mel_and_thinning(self, workdir):
        _, man, labels, dpath = workdir
        d = Dictionary.load(str(dpath))
        ds = TextToSpeechDataset(str(man), str(labels), d, reduction_factor=2,
                                 n_mels=20)
        batch = ds.collate([ds[0], ds[2]], eos_id=2, pad_id=1)
        B, T, M = batch["target_mel"].shape
        assert M == 20 and T % 2 == 0
        assert batch["prev_mel"].shape == (B, T // 2, M)
        # zero BOS frame
        np.testing.assert_allclose(batch["prev_mel"][:, 0], 0.0)
        # thinned shifted: prev_mel[1] == target_mel[r-1] (frame index 1)
        np.testing.assert_allclose(
            batch["prev_mel"][0, 1], batch["target_mel"][0, 1], atol=1e-6
        )


class TestNoising:
    def test_mask_reduces_or_keeps_length(self):
        cfg = NoisingConfig(mask_ratio=0.5)
        tokens = np.arange(5, 25)
        src, tgt = noise_tokens(tokens, cfg, mask_id=30, vocab_size=32, seed=0)
        np.testing.assert_array_equal(tgt, tokens)
        assert len(src) <= len(tokens)
        assert (src == 30).sum() > 0

    def test_deterministic(self):
        cfg = NoisingConfig(mask_ratio=0.3)
        tokens = np.arange(5, 40)
        a, _ = noise_tokens(tokens, cfg, 50, 64, seed=7)
        b, _ = noise_tokens(tokens, cfg, 50, 64, seed=7)
        np.testing.assert_array_equal(a, b)
        c, _ = noise_tokens(tokens, cfg, 50, 64, seed=8)
        assert len(a) != len(c) or (a != c).any()


class TestMultitask:
    def test_schedule_deterministic_and_resumable(self, workdir):
        _, man, labels, dpath = workdir
        d = Dictionary.load(str(dpath))
        ds = SpeechToTextDataset(str(man), str(labels), d)
        spec = TaskSpec(
            "s2t", ds, lambda items: ds.collate(items, 2, 1),
            max_tokens=30000, sample_ratio=2.0,
        )
        loader = MultitaskLoader([spec], seed=5)
        a = [n for n, _ in loader.iter_epoch(0)]
        b = [n for n, _ in loader.iter_epoch(0)]
        assert a == b and len(a) == len(loader)
        # resume mid-epoch
        full = list(loader.iter_epoch(1))
        tail = list(loader.iter_epoch(1, start_batch=2))
        assert len(tail) == len(full) - 2


class TestMetrics:
    def test_edit_distance(self):
        assert edit_distance("kitten", "sitting") == 3
        assert edit_distance([1, 2, 3], [1, 3]) == 1

    def test_wer(self):
        assert wer("a b c d", "a b c d") == 0.0
        assert wer("a b c d", "a x c") == 0.5
        assert corpus_wer(["a b", "c d"], ["a b", "c x"]) == 0.25

    def test_mcd_zero_for_identical(self, rng):
        m = rng.standard_normal((10, 80))
        assert mcd(m, m) == 0.0
        assert mcd(m, m + 1.0) > 0


class TestBleu:
    def test_perfect_match(self):
        from speecht5_tpu.utils.metrics import corpus_bleu

        refs = ["the cat sat on the mat", "hello world again today"]
        assert corpus_bleu(refs, refs) == pytest.approx(100.0)

    def test_partial_and_ordering(self):
        from speecht5_tpu.utils.metrics import corpus_bleu

        refs = ["the cat sat on the mat"]
        good = corpus_bleu(refs, ["the cat sat on a mat"])
        bad = corpus_bleu(refs, ["mat the on sat cat the"])
        assert 0 < bad < good < 100.0

    def test_brevity_penalty(self):
        from speecht5_tpu.utils.metrics import corpus_bleu

        refs = ["a b c d e f g h"]
        short = corpus_bleu(refs, ["a b c d"])
        full = corpus_bleu(refs, ["a b c d e f g h"])
        assert short < full

    def test_empty_hyp(self):
        from speecht5_tpu.utils.metrics import corpus_bleu

        assert corpus_bleu(["a b c"], [""]) == 0.0


class TestSpeech2CDecoderTargets:
    """Speech2C token decoder targets on the pretrain dataset (reference
    Speech2C/speech2c/data/speech2c_dataset.py:65-110)."""

    @pytest.fixture
    def pretrain_ds(self, workdir, tmp_path):
        wdir, man, _labels, _d = workdir
        from speecht5_tpu.data.manifests import SpeechPretrainDataset

        km = wdir / "train.km"
        # frame labels with runs so unique_consecutive collapses them
        km.write_text("\n".join(["5 5 5 7 7 9"] * 4) + "\n")
        return SpeechPretrainDataset(
            manifest=str(man), km_labels=str(km),
            add_decoder_target=True, pad_id=1, eos_id=2, unit_offset=4)

    def test_unique_consecutive_plus_eos(self, pretrain_ds):
        items = [pretrain_ds[0], pretrain_ds[1]]
        batch = pretrain_ds.collate(items, frame_fn=lambda n: 6,
                                    bucketed=False)
        # 5 5 5 7 7 9 -> 5 7 9 (+offset 4) + EOS
        assert batch["decoder_targets"][0].tolist()[:4] == [9, 11, 13, 2]
        # prev_tokens: EOS-shifted
        assert batch["prev_tokens"][0].tolist()[:4] == [2, 9, 11, 13]
        assert batch["decoder_target_lengths"][0] == 4

    def test_fine_tuning_keeps_frame_labels(self, workdir):
        wdir, man, _labels, _d = workdir
        from speecht5_tpu.data.manifests import SpeechPretrainDataset

        km = wdir / "ft.km"
        km.write_text("\n".join(["5 5 7"] * 4) + "\n")
        ds = SpeechPretrainDataset(
            manifest=str(man), km_labels=str(km), add_decoder_target=True,
            fine_tuning=True, pad_id=1, eos_id=2, unit_offset=4)
        batch = ds.collate([ds[0]], frame_fn=lambda n: 3, bucketed=False)
        assert batch["decoder_targets"][0].tolist() == [9, 9, 11, 2]
