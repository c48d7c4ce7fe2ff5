"""Log-mel filterbank, librosa-parity, computed on device.

The reference computes fbanks on the host per utterance with librosa inside the
dataset (reference text_to_speech_dataset.py:97-138: STFT(n_fft=1024, hop=256,
hann, center/reflect) -> |mag| -> mel(80, fmin 80, fmax 7600, slaney norm) ->
log10(max(1e-10, .))).  Here the whole transform is a fused XLA graph: framing
is a gather, the DFT and mel projection are matmuls on the MXU, so a batch of
utterances is featurized in one device call (librosa is not available in this
environment and would be a host-side bottleneck anyway).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann, matching scipy.signal.get_window('hann', n, fftbins=True)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _hz_to_mel(f):
    """Slaney mel scale (librosa htk=False): linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    # maximum() keeps the unused log branch finite at f=0 (fmin=0 is the
    # Whisper filterbank's lower edge)
    log_branch = min_log_mel + np.log(
        np.maximum(f, 1e-10) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mel)


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freq = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freq)


def mel_filterbank(
    sr: int = 16000,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 80.0,
    fmax: float = 7600.0,
) -> np.ndarray:
    """librosa.filters.mel parity (slaney norm, htk=False): [n_mels, 1 + n_fft//2]."""
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney normalization
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases [n_fft, n_bins] so the DFT runs as a matmul on the MXU."""
    n_bins = 1 + n_fft // 2
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def frame_signal(wav, n_fft: int, hop: int, center: bool = True):
    """[..., T] -> [..., n_frames, n_fft] with reflect padding when center."""
    if center:
        pad = [(0, 0)] * (wav.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        wav = jnp.pad(wav, pad, mode="reflect")
    T = wav.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return wav[..., idx]


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "n_mels", "sr", "fmin", "fmax", "center"),
)
def log_mel_spectrogram(
    wav,
    *,
    sr: int = 16000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
    fmin: float = 80.0,
    fmax: float = 7600.0,
    eps: float = 1e-10,
    center: bool = True,
):
    """[..., T] waveform -> [..., n_frames, n_mels] log10-mel, librosa parity.

    n_frames = 1 + T // hop (center=True).  All-matmul formulation: the framed
    signal is multiplied by windowed DFT bases, |mag| projected by the mel matrix.

    center=False skips the reflect pad (n_frames = 1 + (T - n_fft) // hop):
    the batched-training path reflect-pads each utterance on the host BEFORE
    batch zero-padding (data/manifests.py device_mel), so valid frames stay
    bit-compatible with the per-utterance host transform.
    """
    frames = frame_signal(wav.astype(jnp.float32), n_fft, hop, center=center)
    win = jnp.asarray(hann_window(n_fft))
    cos_b, sin_b = _dft_matrices(n_fft)
    frames = frames * win
    # HIGHEST: keep true f32 matmuls on the MXU — the default reduced precision
    # visibly distorts low-energy mel bins after the log.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, jnp.asarray(cos_b), precision=hi)
    im = jnp.matmul(frames, jnp.asarray(sin_b), precision=hi)
    mag = jnp.sqrt(re * re + im * im + 1e-30)
    mel = jnp.matmul(
        mag, jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax)).T, precision=hi
    )
    return jnp.log10(jnp.maximum(eps, mel))


def device_log_mel(wav, **kw):
    """Batched [B, T] -> [B, frames, n_mels] on device: the fused Pallas
    kernel on TPU (ops/pallas_kernels.fused_log_mel, one HBM pass), the
    all-matmul XLA graph elsewhere.  Accepts the same kwargs as
    ``log_mel_spectrogram`` (incl. ``center``)."""
    if jax.default_backend() == "tpu":
        from .pallas_kernels import fused_log_mel

        return fused_log_mel(wav, **kw)
    return log_mel_spectrogram(wav, **kw)


def mel_to_audio(
    log10_mel: np.ndarray,
    *,
    sr: int = 16000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
    fmin: float = 80.0,
    fmax: float = 7600.0,
    n_iter: int = 48,
    seed: int = 0,
) -> np.ndarray:
    """Invert a log10-mel spectrogram to a waveform (Griffin-Lim).

    Checkpoint-free vocoder fallback: the reference's TTS eval dumps mels and
    requires an EXTERNAL vocoder binary to hear anything (reference
    SpeechT5/scripts/generate_speech.py:156-189, README.md:250); this closes
    the chain without artifacts.  Host-side numpy — synthesis-rate bound by
    the AR mel decode, not this inversion.

    log10_mel: [T, n_mels] as produced by ``log_mel_numpy`` /
    ``device_log_mel``.  Returns [T * hop] float32 in [-1, 1].
    """
    mel = np.power(10.0, np.asarray(log10_mel, np.float64))
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax).astype(np.float64)
    # least-squares linear-magnitude estimate, clipped to nonnegative
    mag = np.maximum(0.0, np.linalg.pinv(fb) @ mel.T)      # [bins, T]

    win = hann_window(n_fft).astype(np.float64)
    n_frames = mag.shape[1]
    length = n_frames * hop

    def istft(spec):
        frames = np.fft.irfft(spec.T, n=n_fft, axis=-1) * win
        out = np.zeros((length + n_fft,), np.float64)
        norm = np.zeros_like(out)
        for t in range(n_frames):
            out[t * hop : t * hop + n_fft] += frames[t]
            norm[t * hop : t * hop + n_fft] += win * win
        out = out / np.maximum(norm, 1e-8)
        return out[n_fft // 2 : n_fft // 2 + length]       # undo center pad

    def stft(wav):
        x = np.pad(wav, (n_fft // 2, n_fft // 2), mode="reflect")
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(n_fft)[None, :])
        return np.fft.rfft(x[idx] * win, axis=-1).T        # [bins, T]

    rng = np.random.default_rng(seed)
    angles = np.exp(2j * np.pi * rng.random(mag.shape))
    for _ in range(n_iter):
        wav = istft(mag * angles)
        spec = stft(wav)
        angles = spec / np.maximum(np.abs(spec), 1e-8)
    wav = istft(mag * angles)
    peak = np.max(np.abs(wav))
    if peak > 1.0:
        wav = wav / peak
    return wav.astype(np.float32)


def log_mel_numpy(wav: np.ndarray, **kw) -> np.ndarray:
    """Host-side reference path (numpy rfft) for the data pipeline / tests."""
    sr = kw.get("sr", 16000)
    n_fft = kw.get("n_fft", 1024)
    hop = kw.get("hop", 256)
    n_mels = kw.get("n_mels", 80)
    fmin = kw.get("fmin", 80.0)
    fmax = kw.get("fmax", 7600.0)
    eps = kw.get("eps", 1e-10)
    x = np.pad(wav.astype(np.float64), (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * hann_window(n_fft).astype(np.float64)
    mag = np.abs(np.fft.rfft(frames, axis=-1))
    mel = mag @ mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T.astype(np.float64)
    return np.log10(np.maximum(eps, mel)).astype(np.float32)
