"""fairseq .bin/.idx interop (speecht5_tpu/data/binarized.py).

The reference distributes its text-pretrain corpora fairseq-binarized (the
in-tree fixture SpeechLM/dataset/LibriLM/phone_unit/bin-idx/ ships the
dictionaries + config for such a corpus); these tests round-trip both on-disk
formats and drive a binarized corpus end-to-end through the reference
in-tree phone dictionary into the text-pretrain collator.
"""

import os

import numpy as np
import pytest

from speecht5_tpu.data import binarized
from speecht5_tpu.data.dictionary import Dictionary
from speecht5_tpu.data.manifests import TextPretrainDataset
from speecht5_tpu.data.text_noising import NoisingConfig

REF_DICT = ("/root/reference/SpeechLM/dataset/LibriLM/phone_unit/"
            "bin-idx/dict.phn.txt")


class TestRoundTrip:
    def test_mmap_roundtrip(self, tmp_path):
        seqs = [np.array([4, 5, 6, 2]), np.array([7, 2]),
                np.array([9, 10, 11, 12, 13, 2])]
        prefix = str(tmp_path / "corpus")
        ds = binarized.write_binarized(prefix, seqs, vocab_size=100)
        assert os.path.exists(prefix + ".bin")
        assert os.path.exists(prefix + ".idx")
        assert ds.dtype == np.uint16  # best-fitting for vocab 100
        assert len(ds) == 3
        np.testing.assert_array_equal(ds.sizes, [4, 2, 6])
        for got, want in zip((ds[0], ds[1], ds[2]), seqs):
            assert got.dtype == np.int64
            np.testing.assert_array_equal(got, want)
        # fresh reader over the same files
        ds2 = binarized.MMapIndexedDataset(prefix)
        np.testing.assert_array_equal(ds2[2], seqs[2])
        np.testing.assert_array_equal(ds2[-1], seqs[2])

    def test_large_vocab_uses_int32(self, tmp_path):
        prefix = str(tmp_path / "big")
        ds = binarized.write_binarized(prefix, [np.arange(70000, 70004)],
                                       vocab_size=90000)
        assert ds.dtype == np.int32
        np.testing.assert_array_equal(ds[0], [70000, 70001, 70002, 70003])

    def test_legacy_tntidx_roundtrip(self, tmp_path):
        seqs = [np.array([1, 2, 3]), np.array([4]), np.array([5, 6])]
        prefix = str(tmp_path / "legacy")
        ds = binarized.write_legacy(prefix, seqs)
        assert len(ds) == 3
        np.testing.assert_array_equal(ds.sizes, [3, 1, 2])
        for i, want in enumerate(seqs):
            np.testing.assert_array_equal(ds[i], want)
        # the generic reader auto-detects the magic
        ds2 = binarized.MMapIndexedDataset(prefix)
        np.testing.assert_array_equal(ds2[1], [4])

    def test_bad_magic_rejected(self, tmp_path):
        prefix = str(tmp_path / "junk")
        with open(prefix + ".idx", "wb") as f:
            f.write(b"NOTANIDX\x00" + b"\x00" * 32)
        with open(prefix + ".bin", "wb") as f:
            f.write(b"\x00" * 8)
        with pytest.raises(ValueError, match="magic"):
            binarized.MMapIndexedDataset(prefix)


class TestTextPretrainFromBinarized:
    @pytest.mark.skipif(not os.path.exists(REF_DICT),
                        reason="reference fixture absent")
    def test_reference_dict_end_to_end(self, tmp_path):
        """Binarize phone sentences with the IN-TREE reference dictionary
        (the exact file the shipped LibriLM bin-idx corpus was indexed
        with), then load the .bin/.idx through TextPretrainDataset into the
        BART-noising collator."""
        dic = Dictionary.load(REF_DICT, extra_special_symbols=["<mask>"])
        assert len(dic) > 100  # full phone inventory loaded
        phones = ["SIL AH0_B L_I OW1_E SIL", "DH_B AH1_E W_B ER1 L_I D_E",
                  "SIL HH_B AH0 L_I OW1_E SIL W_B ER1 L_I D_E"] * 4
        prefix = str(tmp_path / "phn")
        binarized.write_binarized(
            prefix,
            [dic.encode_line(s, append_eos=True) for s in phones],
            vocab_size=len(dic),
        )
        ds = TextPretrainDataset(
            text_file=prefix, dictionary=dic, tokens_per_sample=24,
            bos_id=dic.bos_index, eos_id=dic.eos_index, pad_id=dic.pad_index,
            mask_id=dic.index("<mask>"),
            noising=NoisingConfig(mask_ratio=0.3),
        )
        assert len(ds) >= 2
        item = ds[0]
        assert item["tokens"][0] == dic.bos_index
        assert item["tokens"][-1] == dic.eos_index
        batch = ds.collate([ds[0], ds[1]])
        assert batch["tokens"].shape[0] == 2
        assert (batch["tokens"] == dic.index("<mask>")).any()
        assert batch["prev_tokens"][0, 0] == dic.eos_index

    def test_bin_suffix_path_accepted(self, tmp_path):
        """text_file may point at the .bin or .idx file itself."""
        d = tmp_path / "dict.txt"
        d.write_text("\n".join(f"{s} 10" for s in "A B C D E".split()) + "\n")
        dic = Dictionary.load(str(d), extra_special_symbols=["<mask>"])
        prefix = str(tmp_path / "c")
        binarized.write_binarized(
            prefix, [dic.encode_line("A B C D E") for _ in range(8)],
            vocab_size=len(dic))
        ds = TextPretrainDataset(
            text_file=prefix + ".bin", dictionary=dic, tokens_per_sample=12,
            mask_id=dic.index("<mask>"))
        assert len(ds) >= 1
