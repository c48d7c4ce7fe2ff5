"""ctypes bindings for the native data-loader (csrc/dataloader.cpp).

Auto-builds the shared library on first use (g++ is in the image); every entry
point has a numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

# source locations in preference order: the repo checkout's csrc/ (editable
# install / development), then the wheel-packaged copy (setup.py ships the
# sources + Makefile as speecht5_tpu/_csrc)
_pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CSRC_CANDIDATES = (
    os.path.join(os.path.dirname(_pkg_root), "csrc"),
    os.path.join(_pkg_root, "_csrc"),
)


def _csrc_dir() -> Optional[str]:
    for d in _CSRC_CANDIDATES:
        if os.path.isdir(d):
            return d
    return None


def _lib_path() -> Optional[str]:
    d = _csrc_dir()
    return os.path.join(d, "libspeechdata.so") if d else None


_lib = None


def _stale() -> bool:
    """True when the .so is missing or older than any csrc source."""
    csrc = _csrc_dir()
    lib_path = _lib_path()
    if csrc is None:
        return False
    if not os.path.exists(lib_path):
        return True
    so_mtime = os.path.getmtime(lib_path)
    for name in os.listdir(csrc):
        if name.endswith((".cpp", ".cc", ".h", ".hpp")):
            if os.path.getmtime(os.path.join(csrc, name)) > so_mtime:
                return True
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    lib_path = _lib_path()
    if lib_path is None:
        return None
    if _stale():
        try:
            subprocess.run(
                ["make", "-C", _csrc_dir(), "-B"], check=True,
                capture_output=True,
            )
        except Exception:
            if not os.path.exists(lib_path):
                return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.batch_by_size.restype = ctypes.c_int64
    lib.batch_by_size.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.read_wav_batch.restype = None
    lib.read_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.collate_tokens.restype = None
    lib.collate_tokens.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    # newer symbols may be absent from a stale prebuilt .so (e.g. rebuild
    # failed on a machine without a toolchain): degrade per-feature instead
    # of crashing every native caller
    try:
        lib.flac_info.restype = ctypes.c_int64
        lib.flac_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.flac_read_i32.restype = ctypes.c_int64
        lib.flac_read_i32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        lib._has_flac = True
    except AttributeError:
        lib._has_flac = False
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def batch_by_size_native(sizes: np.ndarray, max_tokens: int,
                         max_sentences: int = 0) -> List[np.ndarray]:
    """C++ batcher; falls back to the numpy implementation if unavailable."""
    lib = _load()
    if lib is None:
        from .manifests import batch_by_size

        return batch_by_size(sizes, max_tokens, max_sentences or None)
    n = len(sizes)
    sizes64 = np.ascontiguousarray(sizes, np.int64)
    out_idx = np.empty(n, np.int64)
    out_off = np.empty(n + 1, np.int64)
    nb = lib.batch_by_size(
        _i64p(sizes64), n, max_tokens, max_sentences, _i64p(out_idx),
        _i64p(out_off),
    )
    return [out_idx[out_off[b] : out_off[b + 1]].copy() for b in range(nb)]


def read_wav_batch_native(paths: List[str], max_samples: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Read n wavs into a zero-padded [n, max_samples] float32 array + lengths.
    Falls back to the Python reader."""
    lib = _load()
    if lib is None:
        from .audio import read_wav

        out = np.zeros((len(paths), max_samples), np.float32)
        lengths = np.zeros(len(paths), np.int64)
        for i, p in enumerate(paths):
            w, _ = read_wav(p)
            w = w[:max_samples]
            out[i, : len(w)] = w
            lengths[i] = len(w)
        return out, lengths
    n = len(paths)
    out = np.zeros((n, max_samples), np.float32)
    lengths = np.zeros(n, np.int64)
    srs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.read_wav_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, _i64p(lengths),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, lengths


def flac_info(path: str):
    """STREAMINFO probe: (total_samples, sr, channels, bps, md5 bytes)."""
    lib = _load()
    if lib is None or not getattr(lib, "_has_flac", False):
        raise RuntimeError(
            "native FLAC decoder unavailable (csrc build failed or stale .so)"
        )
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    bps = ctypes.c_int32(0)
    md5 = (ctypes.c_uint8 * 16)()
    n = lib.flac_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                      ctypes.byref(bps), md5)
    if n < 0:
        raise ValueError(f"not a decodable FLAC stream: {path}")
    return int(n), sr.value, ch.value, bps.value, bytes(md5)


def read_flac(path: str, normalize: bool = True
              ) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file with the native decoder (csrc/flac.cpp).

    Returns (samples, sample_rate); samples are float32 in [-1, 1] when
    ``normalize`` (mono files 1-D, else [n, channels] interleaved), or raw
    int32 otherwise.
    """
    total, sr, ch, bps, _ = flac_info(path)
    lib = _load()
    if total:
        cap = total
    else:
        # unknown-length stream: start from a file-size bound and grow if the
        # decode hits the cap (CONSTANT subframes can compress far below
        # 1 byte/sample, so a fixed heuristic could silently truncate)
        cap = max(os.path.getsize(path) * 2 // max(ch, 1), 1024)
    for _attempt in range(4):
        out = np.zeros(cap * ch, np.int32)
        n = lib.flac_read_i32(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
        )
        if n < 0:
            raise ValueError(f"FLAC decode failed: {path}")
        if total or n < cap:
            break
        cap *= 8  # hit the cap on an unknown-length stream: retry bigger
    else:
        raise ValueError(f"FLAC stream longer than {cap} samples: {path}")
    data = out[: n * ch].reshape(n, ch)
    if normalize:
        data = (data.astype(np.float32) / float(1 << (bps - 1)))
    if ch == 1:
        data = data[:, 0]
    return data, sr


def collate_tokens_native(token_lists: List[np.ndarray], max_len: int,
                          pad_id: int, eos_id: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Padded targets + EOS-shifted prev tokens in one native pass."""
    lib = _load()
    n = len(token_lists)
    if lib is None:
        tgt = np.full((n, max_len), pad_id, np.int64)
        prev = np.full((n, max_len), pad_id, np.int64)
        for i, t in enumerate(token_lists):
            L = min(len(t), max_len)
            tgt[i, :L] = t[:L]
            prev[i, 0] = eos_id
            prev[i, 1:L] = t[: L - 1]
        return tgt, prev
    flat = np.concatenate([np.asarray(t, np.int64) for t in token_lists])
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(t) for t in token_lists], out=offsets[1:])
    tgt = np.empty((n, max_len), np.int64)
    prev = np.empty((n, max_len), np.int64)
    lib.collate_tokens(
        _i64p(flat), _i64p(offsets), n, max_len, pad_id, eos_id,
        _i64p(tgt), _i64p(prev),
    )
    return tgt, prev
