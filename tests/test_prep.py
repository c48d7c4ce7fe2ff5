"""Data-prep utilities (reference SpeechLM data_process/ scripts).

Behavioral specs: wrd2ltr.py, phoneize_with_sil.py,
phoneme_tokenizer/ltr2kaldi_phn_sil025.py,
phoneme_tokenizer/repeat_withou_insert_sil_less_4375.py,
filter_paireddata_by_len.py, get_t2u_manifest{,_textonly}.py.
"""

import os

import numpy as np
import pytest

from speecht5_tpu.data import prep
from speecht5_tpu.data.audio import write_wav
from speecht5_tpu.data.manifests import load_audio_manifest

REF_FLAC = "/root/reference/WavLLM/wavllm/test_data/audio/asr.flac"


class TestHeaders:
    def test_wav_num_samples(self, tmp_path):
        p = str(tmp_path / "a.wav")
        write_wav(p, np.zeros(12345, np.float32))
        assert prep.wav_num_samples(p) == 12345

    @pytest.mark.skipif(not os.path.exists(REF_FLAC), reason="no fixture")
    def test_flac_num_samples_matches_decoder(self):
        from speecht5_tpu.data import native
        total, _sr, _ch, _bps, _md5 = native.flac_info(REF_FLAC)
        assert prep.flac_num_samples(REF_FLAC) == total


class TestManifest:
    def test_create_and_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        root = tmp_path / "wavs"
        (root / "spk1").mkdir(parents=True)
        sizes = {}
        for i, n in enumerate([8000, 16000, 4000]):
            rel = os.path.join("spk1", f"utt{i}.wav")
            write_wav(str(root / rel), rng.standard_normal(n) * 0.1)
            sizes[rel] = n
        train, valid = prep.create_audio_manifest(str(root))
        assert len(train) == 4 and len(valid) == 1  # root line + 3 utts
        out = tmp_path / "train.tsv"
        out.write_text("\n".join(train) + "\n")
        mroot, names, nframes = load_audio_manifest(str(out))
        assert mroot == str(root)
        assert {n: s for n, s in zip(names, nframes)} == sizes

    def test_valid_split_deterministic(self, tmp_path):
        rng = np.random.default_rng(0)
        root = tmp_path / "wavs"
        root.mkdir()
        for i in range(20):
            write_wav(str(root / f"u{i:02d}.wav"),
                      rng.standard_normal(1000) * 0.1)
        t1, v1 = prep.create_audio_manifest(str(root), valid_percent=0.3,
                                            seed=7)
        t2, v2 = prep.create_audio_manifest(str(root), valid_percent=0.3,
                                            seed=7)
        assert t1 == t2 and v1 == v2
        assert len(v1) > 1  # some files landed in valid
        assert len(t1) + len(v1) == 22  # 20 utts + 2 root lines


class TestTranscripts:
    def test_wrd2ltr(self):
        # reference wrd2ltr.py: drop <unk>, upper, | boundaries + trailing |
        assert prep.wrd_to_ltr("hello <unk> world") == \
            "H E L L O | W O R L D |"
        assert prep.ltr_to_words("H E L L O | W O R L D |") == \
            ["HELLO", "WORLD"]

    def test_phonemize_skip_and_as_is(self):
        lex = {"CAT": ["K", "AE", "T"], "SAT": ["S", "AE", "T"]}
        rng = np.random.default_rng(0)
        assert prep.phonemize_with_sil("cat sat", lex, rng) == \
            ["K", "AE", "T", "S", "AE", "T"]
        assert prep.phonemize_with_sil("cat dog", lex, rng) is None
        assert prep.phonemize_with_sil(
            "cat dog", lex, rng, oov="as-is") == ["K", "AE", "T", "DOG"]
        with pytest.raises(KeyError):
            prep.phonemize_with_sil("dog", lex, rng, oov="error")

    def test_phonemize_surround_and_sil_prob(self):
        lex = {"A": ["AH"], "B": ["BE"]}
        rng = np.random.default_rng(0)
        out = prep.phonemize_with_sil("a b", lex, rng, sil_prob=1.0,
                                      surround=True)
        assert out == [prep.SIL, "AH", prep.SIL, "BE", prep.SIL]

    def test_kaldi_phonemize(self):
        lex = {"!SIL": ["SIL"], "<UNK>": ["SPN"], "CAT": ["K", "AE", "T"]}
        rng = np.random.default_rng(0)
        phones, oov, total = prep.kaldi_phonemize(
            "C A T | D O G |", lex, rng, sil_prob=0.0)
        assert phones == ["SIL", "K", "AE", "T", "SPN", "SIL"]
        assert (oov, total) == (1, 2)

    def test_repeat_phones_and_max_len_fallback(self):
        stats = {"AH": [3.0, 0.0], "BE": [2.0, 0.0]}
        rng = np.random.default_rng(0)
        out = prep.repeat_phones(["AH", "BE"], stats, rng)
        assert out == ["AH"] * 3 + ["BE"] * 2
        # unknown phone gets the (5, 2.5) default; count clamped >= 1
        out = prep.repeat_phones(["ZZ"], {}, rng, default=(1.0, 0.0))
        assert out == ["ZZ"]
        # a sequence that can't fit triggers the deterministic mean-minus path
        out = prep.repeat_phones(["AH"] * 100, {"AH": [50.0, 0.0]},
                                 rng, max_len=200)
        assert len(out) < 200 and set(out) == {"AH"}

    def test_filter_paired(self):
        src = ["a b", "", "x " * 10]
        tgt = ["c", "d", "e"]
        s, t = prep.filter_paired_by_len(src, tgt, max_len=5)
        assert s == ["a b"] and t == ["c"]


class TestT2UManifest:
    def test_aligned_rows(self, tmp_path):
        am = tmp_path / "train.audio.tsv"
        am.write_text("/data\nspk1/spk1-001.wav\t32000\n")
        # frame-aligned phone ids 5 5 5 9 9 -> reduced [5, 9], dur [3, 2]
        (tmp_path / "train.phn").write_text("5 5 5 9 9\n")
        (tmp_path / "train.km").write_text("7 7 8 8 8\n")
        rows = prep.t2u_manifest_rows(str(am), str(tmp_path / "train.phn"),
                                      str(tmp_path / "train.km"))
        assert rows == [{
            "id": "spk1-001", "speaker": "spk1", "n_frames": "5",
            "unit": "7 7 8 8 8", "duration": "3 2", "tgt_text": "5 9",
        }]
        out = tmp_path / "t2u.tsv"
        prep.write_tsv(rows, str(out))
        header, data = out.read_text().splitlines()
        assert header.split("\t") == list(prep.T2U_COLUMNS)
        assert data.split("\t")[3] == "5 9"

    def test_length_mismatch_raises(self, tmp_path):
        am = tmp_path / "t.audio.tsv"
        am.write_text("/data\na.wav\t100\n")
        (tmp_path / "t.phn").write_text("5 5\n")
        (tmp_path / "t.km").write_text("7 7 7\n")
        with pytest.raises(ValueError, match="aligned phones"):
            prep.t2u_manifest_rows(str(am), str(tmp_path / "t.phn"),
                                   str(tmp_path / "t.km"))

    def test_textonly_rows(self, tmp_path):
        (tmp_path / "t.phn").write_text("5 9 5\n9 9\n")
        rows = prep.t2u_manifest_textonly_rows(str(tmp_path / "t.phn"))
        assert [r["id"] for r in rows] == ["librilm-0", "librilm-1"]
        assert rows[0]["n_frames"] == "3" and rows[0]["unit"] == "0"


class TestPrepCLI:
    def test_manifest_and_wrd2ltr(self, tmp_path):
        from speecht5_tpu.cli.prep import main
        rng = np.random.default_rng(0)
        root = tmp_path / "wavs"
        root.mkdir()
        write_wav(str(root / "u0.wav"), rng.standard_normal(2000) * 0.1)
        out = tmp_path / "train.tsv"
        assert main(["manifest", "--audio-root", str(root),
                     "--out", str(out)]) == 0
        _root, names, sizes = load_audio_manifest(str(out))
        assert names == ["u0.wav"] and sizes.tolist() == [2000]

        (tmp_path / "in.wrd").write_text("hi there\n")
        assert main(["wrd2ltr", "--input", str(tmp_path / "in.wrd"),
                     "--output", str(tmp_path / "out.ltr")]) == 0
        assert (tmp_path / "out.ltr").read_text() == "H I | T H E R E |\n"

    def test_kaldi_phn_cli(self, tmp_path):
        from speecht5_tpu.cli.prep import main
        lex = tmp_path / "align_lexicon.txt"
        lex.write_text("!SIL !SIL SIL\n<UNK> <UNK> SPN\nCAT CAT K AE T\n")
        (tmp_path / "in.ltr").write_text("C A T |\n")
        out = tmp_path / "out"
        assert main(["kaldi-phn", "--input", str(tmp_path / "in.ltr"),
                     "--lexicon", str(lex), "--output", str(out),
                     "--sil-prob", "0"]) == 0
        got = (tmp_path / "out.kaldi_phn_sil025").read_text().strip()
        assert got == "SIL K AE T SIL"


COVOST_TSV = ("/root/reference/SpeechLM/dataset/CommonVoice/v4/en/en-de/"
              "dev-sample100_st_en_de_local.tsv")


@pytest.mark.skipif(not os.path.exists(COVOST_TSV), reason="no fixture")
class TestSTManifest:
    """CoVoST2 columned ST TSV -> our manifest + labels (the shipped
    reference fixture works as-is)."""

    def test_convert_reference_fixture(self, tmp_path):
        manifest, labels = prep.convert_st_tsv(COVOST_TSV,
                                               audio_root=str(tmp_path))
        n_rows = sum(1 for _ in open(COVOST_TSV)) - 1
        assert len(labels) == len(manifest) - 1 == n_rows
        # German targets survive unicode round trip
        assert labels[0] == ("Wenn Wasser knapp ist, verschwenden Sie es "
                             "nicht.")
        out = tmp_path / "m.tsv"
        out.write_text("\n".join(manifest) + "\n")
        root, names, sizes = load_audio_manifest(str(out))
        assert root == str(tmp_path)
        assert names[0] == "common_voice_en_18540003.wav"
        assert sizes[0] == 90624

    def test_spm_char_model_encodes_targets(self):
        from speecht5_tpu.data.sentencepiece import SentencePieceModel
        spm_path = os.path.join(os.path.dirname(COVOST_TSV),
                                "spm_char_st_en_de.model")
        if not os.path.exists(spm_path):
            pytest.skip("no spm fixture")
        sp = SentencePieceModel.load(spm_path)
        _manifest, labels = prep.convert_st_tsv(COVOST_TSV)
        pieces = sp.encode(labels[0], out="piece")
        assert len(pieces) > 10  # char model: ~one piece per character

    def test_cli_subcommand(self, tmp_path):
        from speecht5_tpu.cli.prep import main
        m, l = tmp_path / "m.tsv", tmp_path / "l.de"
        assert main(["st-manifest", "--tsv", COVOST_TSV,
                     "--out-manifest", str(m), "--out-labels", str(l),
                     "--audio-root", "/data/wav"]) == 0
        n_rows = sum(1 for _ in open(COVOST_TSV)) - 1
        assert len(l.read_text().splitlines()) == n_rows
        assert m.read_text().splitlines()[0] == "/data/wav"


class TestResample:
    """Windowed-sinc rational resampler (data/audio.resample) — the role
    sox/torchaudio play in the reference prep (16 kHz recipe inputs)."""

    def test_tone_preserved_and_alias_suppressed(self):
        import numpy as np
        from speecht5_tpu.data.audio import resample

        sr1, sr2 = 44100, 16000
        t = np.arange(sr1) / sr1
        tone = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = resample(tone, sr1, sr2)
        assert abs(len(out) - sr2) <= 1
        sp = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak = np.fft.rfftfreq(len(out), 1 / sr2)[sp.argmax()]
        assert abs(peak - 440.0) < 2.0
        assert abs(out[2000:-2000].max() - 0.5) < 0.01
        # 9 kHz is above the 8 kHz Nyquist of the target: must be rejected,
        # not folded down
        alias = 0.5 * np.sin(2 * np.pi * 9000 * t).astype(np.float32)
        out_a = resample(alias, sr1, sr2)
        rms = float(np.sqrt((out_a[2000:-2000] ** 2).mean()))
        assert rms < 0.01, f"aliasing energy {rms}"

    def test_upsample_and_identity(self):
        import numpy as np
        from speecht5_tpu.data.audio import resample

        t = np.arange(16000) / 16000.0
        tone = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
        up = resample(tone, 16000, 24000)
        sp = np.abs(np.fft.rfft(up * np.hanning(len(up))))
        assert abs(np.fft.rfftfreq(len(up), 1 / 24000)[sp.argmax()] - 440) < 2
        same = resample(tone, 16000, 16000)
        np.testing.assert_array_equal(same, tone)

    def test_cli_resample_reference_fixture(self, tmp_path):
        import numpy as np
        from speecht5_tpu.cli.prep import main
        from speecht5_tpu.data.audio import read_audio, write_wav

        src = "/root/reference/WavLLM/wavllm/test_data/audio/II-task.wav"
        if not os.path.exists(src):
            # synthesize a 44.1 kHz stand-in
            src = str(tmp_path / "in.wav")
            t = np.arange(44100) / 44100.0
            write_wav(src, 0.3 * np.sin(2 * np.pi * 300 * t), sr=44100)
        out = str(tmp_path / "out16k.wav")
        main(["resample", "-i", src, "-o", out, "--sr", "16000"])
        wav, sr = read_audio(out)
        assert sr == 16000 and len(wav) > 0
        # read_audio(target_sr=...) resamples on the fly to the same result
        direct, sr2 = read_audio(src, target_sr=16000)
        assert sr2 == 16000
        n = min(len(direct), len(wav))
        np.testing.assert_allclose(direct[:n], wav[:n], atol=1e-3)
