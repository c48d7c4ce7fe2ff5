"""Unit tests for core ops: mel parity, positional encodings, span masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht5_tpu.ops.mel import (
    log_mel_spectrogram,
    log_mel_numpy,
    mel_filterbank,
    hann_window,
)
from speecht5_tpu.ops.positional import (
    fairseq_sinusoidal_table,
    fairseq_positions_from_mask,
    espnet_sinusoidal_table,
)
from speecht5_tpu.ops.masking import compute_span_mask


class TestMel:
    def test_jax_matches_numpy(self, rng):
        wav = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
        ref = log_mel_numpy(wav)
        out = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)

    def test_frame_count(self, rng):
        # librosa center=True: n_frames = 1 + T // hop
        wav = rng.standard_normal(16000).astype(np.float32)
        out = log_mel_spectrogram(jnp.asarray(wav))
        assert out.shape == (1 + 16000 // 256, 80)

    def test_batched(self, rng):
        wav = rng.standard_normal((3, 8192)).astype(np.float32)
        out = log_mel_spectrogram(jnp.asarray(wav))
        assert out.shape == (3, 1 + 8192 // 256, 80)
        single = log_mel_spectrogram(jnp.asarray(wav[1]))
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=1e-4)

    def test_mel_filterbank_properties(self):
        fb = mel_filterbank()
        assert fb.shape == (80, 513)
        assert (fb >= 0).all()
        # every filter has some support
        assert (fb.sum(axis=1) > 0).all()

    def test_hann_periodic(self):
        w = hann_window(8)
        # periodic hann: w[0] == 0, len 8, not symmetric-normalized
        assert w[0] == 0.0
        np.testing.assert_allclose(w[4], 1.0, atol=1e-6)

    def test_griffin_lim_spectral_round_trip(self):
        """mel -> mel_to_audio -> mel must preserve the spectral envelope
        (phase is reconstructed, so a loose log-domain tolerance): the
        checkpoint-free vocoder behind serve --griffin-lim and the TTS
        intelligibility gate (tests/test_real_speech.py)."""
        from speecht5_tpu.ops.mel import mel_to_audio

        t = np.arange(32000) / 16000.0
        wav = (0.4 * np.sin(2 * np.pi
                            * (150 + 40 * np.sin(2 * np.pi * 1.5 * t)) * t)
               + 0.1 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)
        mel = log_mel_numpy(wav, n_mels=80)
        rec = mel_to_audio(mel, n_mels=80)
        assert abs(len(rec) - len(wav)) <= 256
        assert np.isfinite(rec).all() and np.abs(rec).max() <= 1.0
        mel2 = log_mel_numpy(rec[: len(wav)], n_mels=80)
        n = min(len(mel), len(mel2))
        err = np.abs(mel[:n] - mel2[:n]).mean()
        assert err < 0.5, f"log10-mel round-trip error {err}"


class TestPositional:
    def test_fairseq_table_structure(self):
        t = fairseq_sinusoidal_table(10, 8, padding_idx=1)
        assert t.shape == (10, 8)
        np.testing.assert_allclose(t[1], 0.0)  # padding row zeroed
        # half-sin/half-cos concat: position 0 -> sin part 0, cos part 1
        np.testing.assert_allclose(t[0, :4], 0.0, atol=1e-7)
        np.testing.assert_allclose(t[0, 4:], 1.0, atol=1e-7)

    def test_fairseq_positions(self):
        mask = jnp.asarray([[True, True, False], [True, False, False]])
        pos = fairseq_positions_from_mask(mask, padding_idx=1)
        np.testing.assert_array_equal(np.asarray(pos), [[2, 3, 1], [2, 1, 1]])

    def test_espnet_table_interleaved(self):
        t = espnet_sinusoidal_table(5, 6)
        # position 0: sin->0 at even idx, cos->1 at odd idx
        np.testing.assert_allclose(t[0, 0::2], 0.0, atol=1e-7)
        np.testing.assert_allclose(t[0, 1::2], 1.0, atol=1e-7)


class TestSpanMask:
    def test_shapes_and_padding(self):
        rng = jax.random.PRNGKey(0)
        lengths = jnp.asarray([50, 30, 10])
        m = compute_span_mask(rng, lengths, 64, mask_prob=0.5, span_len=5)
        m = np.asarray(m)
        assert m.shape == (3, 64)
        # no masking beyond lengths
        assert not m[0, 50:].any()
        assert not m[1, 30:].any()
        assert not m[2, 10:].any()

    def test_mask_rate(self):
        rng = jax.random.PRNGKey(1)
        lengths = jnp.full((16,), 500)
        m = np.asarray(
            compute_span_mask(rng, lengths, 500, mask_prob=0.65, span_len=10)
        )
        rate = m.mean()
        # fairseq "static" with overlap: effective rate below nominal but nonzero
        assert 0.25 < rate < 0.70

    def test_min_masks(self):
        rng = jax.random.PRNGKey(2)
        lengths = jnp.full((4,), 100)
        m = np.asarray(
            compute_span_mask(rng, lengths, 100, mask_prob=0.01, span_len=3,
                              min_masks=2)
        )
        # at least 2 spans of 3 => >= 3 masked positions even at tiny prob
        assert (m.sum(axis=1) >= 3).all()

    def test_deterministic(self):
        rng = jax.random.PRNGKey(3)
        lengths = jnp.full((2,), 80)
        a = compute_span_mask(rng, lengths, 80, 0.5, 8)
        b = compute_span_mask(rng, lengths, 80, 0.5, 8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
