"""Waveform IO without external audio libraries.

The reference reads audio with soundfile/libsndfile
(reference data/speech_to_text_dataset.py:115).  Neither soundfile nor librosa
exists in this environment, so PCM WAV parsing is implemented directly (stdlib
struct + numpy); a C++ batch ingest lives in csrc/ for the hot path.
"""

from __future__ import annotations

import struct
import wave
from typing import Tuple

import numpy as np


def read_audio(path: str, target_sr: int = None) -> Tuple[np.ndarray, int]:
    """Read WAV or FLAC by extension -> (float32 mono waveform, sample_rate).
    FLAC decodes through the native csrc decoder (the reference leans on
    libsndfile via soundfile, reference speech_to_text_dataset.py:115).
    ``target_sr`` resamples on read (sox/torchaudio's role upstream)."""
    if path.lower().endswith(".flac"):
        from .native import read_flac

        wav, sr = read_flac(path, normalize=True)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        wav = wav.astype(np.float32)
    else:
        wav, sr = read_wav(path)
    if target_sr is not None and sr != target_sr:
        return resample(wav, sr, target_sr), target_sr
    return wav, sr


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV file -> (float32 mono waveform in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def write_wav(path: str, wav: np.ndarray, sr: int = 16000):
    x = np.clip(wav, -1.0, 1.0)
    pcm = (x * 32767.0).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def resample(wav: np.ndarray, sr_in: int, sr_out: int = 16000,
             num_zeros: int = 16) -> np.ndarray:
    """Rational windowed-sinc resampling — the role sox / torchaudio.resample
    plays in the reference data prep (its recipes demand 16 kHz input; e.g.
    reference WavLLM ships a 44.1 kHz fixture its pipeline resamples
    upstream).  No external audio libraries.

    Design: output j sits at continuous input position j*M/L (L/M =
    sr_out/sr_in reduced); each output is a dot product of the input window
    with a Hann-windowed sinc cut at min(sr_in, sr_out)/2 (anti-aliasing
    when downsampling), with ``num_zeros`` sinc zero-crossings per side.
    Fully vectorized: one [n_out, taps] gather + matmul-like reduction.
    """
    if sr_in == sr_out:
        return wav.astype(np.float32)
    from math import ceil, gcd

    g = gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    x = wav.astype(np.float64)
    n_out = int(ceil(len(x) * L / M))
    # cutoff as a fraction of sr_in (<= 0.5); sinc zeros every 1/(2 fc_rel)
    # input samples, so the window radius is num_zeros / (2 fc_rel)
    fc_rel = 0.5 * min(1.0, L / M)
    radius = int(ceil(num_zeros / (2.0 * fc_rel)))
    center = np.arange(n_out, dtype=np.float64) * M / L   # input-sample units
    ileft = np.floor(center).astype(np.int64) - radius
    taps = np.arange(2 * radius + 1)
    idx = ileft[:, None] + taps[None, :]
    dt = idx.astype(np.float64) - center[:, None]         # input-sample units
    win = 0.5 * (1.0 + np.cos(np.pi * dt / (radius + 1)))  # Hann over support
    hmat = 2.0 * fc_rel * np.sinc(2.0 * fc_rel * dt) * win
    valid = (idx >= 0) & (idx < len(x))
    samples = np.where(valid, x[np.clip(idx, 0, len(x) - 1)], 0.0)
    out = (hmat * samples).sum(axis=1)
    return out.astype(np.float32)


def layer_norm_wav(wav: np.ndarray) -> np.ndarray:
    """Per-utterance normalization (reference speech_to_text_dataset.py:259-269
    applies F.layer_norm over the waveform when task.normalize)."""
    m = wav.mean()
    v = wav.var()
    return (wav - m) / np.sqrt(v + 1e-5)
