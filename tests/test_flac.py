"""Native FLAC decoder tests (csrc/flac.cpp).

Correctness oracle: FLAC's STREAMINFO block stores the MD5 digest of the
unencoded audio — decoding the real LPC-coded files shipped as reference
data fixtures (WavLLM/wavllm/test_data/audio/*.flac) and matching the digest
proves bit-exactness through the rice/LPC/stereo paths."""

import hashlib
import os

import numpy as np
import pytest

from speecht5_tpu.data import native

FIXTURES = [
    "/root/reference/WavLLM/wavllm/test_data/audio/asr.flac",
    "/root/reference/WavLLM/wavllm/test_data/audio/st.flac",
]

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


class TestFlacDecode:
    @pytest.mark.parametrize("path", FIXTURES)
    def test_md5_bit_exact(self, path):
        if not os.path.exists(path):
            pytest.skip("fixture missing")
        total, sr, ch, bps, md5 = native.flac_info(path)
        assert sr == 16000 and ch == 1 and bps == 16
        raw, sr2 = native.read_flac(path, normalize=False)
        assert sr2 == sr
        assert raw.shape[0] == total
        packed = raw.astype("<i2").tobytes()
        assert hashlib.md5(packed).hexdigest() == md5.hex()

    def test_normalized_range(self):
        path = FIXTURES[0]
        if not os.path.exists(path):
            pytest.skip("fixture missing")
        wav, sr = native.read_flac(path)
        assert wav.dtype == np.float32
        assert np.abs(wav).max() <= 1.0
        assert np.abs(wav).mean() > 1e-4  # real speech, not silence

    def test_read_audio_dispatch(self, tmp_path):
        """read_audio routes .flac to the native decoder and .wav to the
        python reader, returning the same contract."""
        from speecht5_tpu.data.audio import read_audio, write_wav

        path = FIXTURES[0]
        if not os.path.exists(path):
            pytest.skip("fixture missing")
        flac_wav, sr = read_audio(path)
        assert flac_wav.ndim == 1 and sr == 16000

        rng = np.random.default_rng(0)
        ref = (rng.standard_normal(4000) * 0.1).astype(np.float32)
        wav_path = str(tmp_path / "x.wav")
        write_wav(wav_path, ref)
        got, sr2 = read_audio(wav_path)
        assert sr2 == 16000
        # write scales by 32767, read by 1/32768: up to ~2 LSB apart
        np.testing.assert_allclose(got, ref, atol=2.5 / 32768)

    def test_flac_manifest_dataset(self, tmp_path):
        """A manifest pointing at FLAC files feeds SpeechToTextDataset."""
        from speecht5_tpu.data.manifests import SpeechToTextDataset
        from speecht5_tpu.data.dictionary import Dictionary

        path = FIXTURES[1]
        if not os.path.exists(path):
            pytest.skip("fixture missing")
        total, sr, ch, bps, _ = native.flac_info(path)
        (tmp_path / "m.tsv").write_text(
            os.path.dirname(path) + "\n" + os.path.basename(path)
            + f"\t{total}\n"
        )
        (tmp_path / "m.ltr").write_text("H I |\n")
        (tmp_path / "d.txt").write_text("| 1\nH 1\nI 1\n")
        ds = SpeechToTextDataset(
            manifest=str(tmp_path / "m.tsv"), labels=str(tmp_path / "m.ltr"),
            dictionary=Dictionary.load(str(tmp_path / "d.txt")),
        )
        item = ds[0]
        assert item["wav"].shape[0] == total
        assert np.isfinite(item["wav"]).all()
