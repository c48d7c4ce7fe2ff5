"""SentencePiece reader/encoder + TokenBlock text-pretrain dataset tests.

The SPM tests run against REAL released models shipped inside the reference
tree (SpeechUT/dataset/MuSTC/en_de/spm_unigram10000.model — unigram 10k,
SpeechLM/dataset/CommonVoice/v4/en/en-de/spm_char_st_en_de.model — char),
used as data fixtures only."""

import os

import numpy as np
import pytest

from speecht5_tpu.data.sentencepiece import (
    SentencePieceModel, UNIGRAM, CHAR, WS,
)
from speecht5_tpu.data.dictionary import Dictionary
from speecht5_tpu.data.manifests import TextPretrainDataset
from speecht5_tpu.data.text_noising import NoisingConfig

SPM_UNIGRAM = "/root/reference/SpeechUT/dataset/MuSTC/en_de/spm_unigram10000.model"
SPM_CHAR = (
    "/root/reference/SpeechLM/dataset/CommonVoice/v4/en/en-de/"
    "spm_char_st_en_de.model"
)
SPM_VOCAB_TXT = SPM_CHAR.replace(".model", ".txt")


@pytest.mark.skipif(not os.path.exists(SPM_UNIGRAM), reason="fixture missing")
class TestUnigramSPM:
    def test_load(self):
        sp = SentencePieceModel.load(SPM_UNIGRAM)
        assert sp.model_type == UNIGRAM
        assert len(sp) == 10000
        assert sp.pieces[sp.unk_id].type == 2  # UNKNOWN

    def test_encode_round_trip(self):
        sp = SentencePieceModel.load(SPM_UNIGRAM)
        text = "the quick brown fox jumps over the lazy dog"
        ids = sp.encode(text)
        assert len(ids) > 0
        assert all(0 <= i < len(sp) for i in ids)
        assert sp.decode(ids) == text
        # pieces re-join to the normalized string
        pieces = sp.encode(text, out="piece")
        assert "".join(pieces) == WS + text.replace(" ", WS)

    def test_viterbi_beats_char_segmentation(self):
        """The Viterbi segmentation's total score must be >= the all-chars
        segmentation (optimality sanity on a real model)."""
        sp = SentencePieceModel.load(SPM_UNIGRAM)
        text = "hello"
        pieces = sp.encode(text, out="piece")
        score = sum(sp.pieces[sp.piece_to_id[p]].score for p in pieces)
        s = sp.normalize(text)
        char_ids = [sp.piece_to_id.get(c) for c in s]
        if all(i is not None for i in char_ids):
            char_score = sum(sp.pieces[i].score for i in char_ids)
            assert score >= char_score - 1e-6
        # common words tokenize compactly
        assert len(pieces) <= len(s)


@pytest.mark.skipif(not os.path.exists(SPM_CHAR), reason="fixture missing")
class TestCharSPM:
    def test_char_model(self):
        sp = SentencePieceModel.load(SPM_CHAR)
        assert sp.model_type == CHAR
        ids = sp.encode("ab c", out="piece")
        assert ids == [WS, "a", "b", WS, "c"]
        assert sp.decode(sp.encode("ab c")) == "ab c"

    def test_ids_match_released_vocab_file(self):
        """Piece order in the .model must line up with the released fairseq
        dict file (symbol count per row; fairseq prepends 4 specials, and the
        model's own first 4 pieces are the same specials — so .txt row i is
        piece i+4)."""
        sp = SentencePieceModel.load(SPM_CHAR)
        if not os.path.exists(SPM_VOCAB_TXT):
            pytest.skip("vocab txt missing")
        assert [p.piece for p in sp.pieces[:4]] == [
            "<s>", "<pad>", "</s>", "<unk>"
        ]
        with open(SPM_VOCAB_TXT, encoding="utf-8") as f:
            rows = [l.split()[0] for l in f if l.strip()]
        for i, sym in enumerate(rows[:30]):
            assert sp.pieces[i + 4].piece == sym


class TestTextPretrainDataset:
    @pytest.fixture
    def corpus(self, tmp_path):
        p = tmp_path / "corpus.txt"
        lines = ["H E L L O | W O R L D |", "A L O H A |",
                 "D A T A | R A D A R |"] * 5
        p.write_text("\n".join(lines) + "\n")
        d = tmp_path / "dict.txt"
        d.write_text("\n".join(f"{s} 10" for s in "| E T A H L O W R D") + "\n")
        return str(p), str(d)

    def test_token_blocks_and_noising(self, corpus):
        text_file, dict_file = corpus
        dic = Dictionary.load(
            dict_file, extra_special_symbols=["<mask>", "<ctc_blank>"]
        )
        ds = TextPretrainDataset(
            text_file=text_file, dictionary=dic, tokens_per_sample=16,
            mask_id=dic.index("<mask>"),
            noising=NoisingConfig(mask_ratio=0.3),
        )
        assert len(ds) > 1
        item = ds[0]
        assert item["tokens"][0] == dic.bos_index
        assert item["tokens"][-1] == dic.eos_index
        assert len(item["tokens"]) <= 16

        batch = ds.collate([ds[0], ds[1]])
        assert batch["tokens"].shape[0] == 2
        # targets are the clean blocks
        np.testing.assert_array_equal(
            batch["targets"][0][: len(ds[0]["tokens"])], ds[0]["tokens"]
        )
        # source contains mask tokens
        assert (batch["tokens"] == dic.index("<mask>")).any()
        # prev tokens eos-shifted
        assert batch["prev_tokens"][0, 0] == dic.eos_index
        # deterministic per (seed, id, epoch)
        batch2 = ds.collate([ds[0], ds[1]])
        np.testing.assert_array_equal(batch["tokens"], batch2["tokens"])
        batch3 = ds.collate([ds[0], ds[1]], epoch=1)
        assert not np.array_equal(batch["tokens"], batch3["tokens"])

    def test_break_modes(self, corpus):
        text_file, dict_file = corpus
        dic = Dictionary.load(dict_file, extra_special_symbols=["<mask>"])
        ds_eos = TextPretrainDataset(
            text_file=text_file, dictionary=dic, tokens_per_sample=64,
            break_mode="eos", mask_id=dic.index("<mask>"),
        )
        assert len(ds_eos) == 15  # one block per sentence
        ds_complete = TextPretrainDataset(
            text_file=text_file, dictionary=dic, tokens_per_sample=32,
            break_mode="complete", mask_id=dic.index("<mask>"),
        )
        # whole sentences packed: every block size <= 32
        assert all(s <= 32 for s in ds_complete.sizes)
        ds_none = TextPretrainDataset(
            text_file=text_file, dictionary=dic, tokens_per_sample=16,
            break_mode="none", mask_id=dic.index("<mask>"),
        )
        # continuous stream: all blocks except the last are exactly full
        assert all(s == 16 for s in ds_none.sizes[:-1])
