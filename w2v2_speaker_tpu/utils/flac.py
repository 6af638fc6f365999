"""ctypes loader + numpy API for the native FLAC decoder (native/flac.cpp).

Replaces the reference's torchaudio/libsndfile FLAC path for LibriSpeech
(reference: src/data/modules/speech/librispeech.py:662-804). Decode returns
float32 in [-1, 1) (and optionally the raw int PCM), matching the scaling
torchaudio.load applies.

Builds `native/libw2vtpu_flac.so` on demand (make + g++, no external deps).
If the toolchain is unavailable, `available()` is False and callers raise a
clear error telling the user to convert to WAV offline instead.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "probe", "read_flac", "load"]

_NATIVE_DIR = pathlib.Path(__file__).parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libw2vtpu_flac.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)

_ERRORS = {
    -1: "not a FLAC stream (bad magic)",
    -2: "truncated metadata",
    -3: "missing STREAMINFO",
    -4: "unsupported stream parameters",
    -5: "malformed frame header",
    -6: "frame CRC mismatch (corrupt header or frame body)",
    -7: "channel count changed mid-stream",
    -8: "malformed subframe",
    -9: "more samples than STREAMINFO declared",
}


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", str(_NATIVE_DIR), "libw2vtpu_flac.so"],
            capture_output=True,
            timeout=120,
        )
        return r.returncode == 0 and _LIB_PATH.exists()
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        i64, i32 = ctypes.c_int64, ctypes.c_int32
        lib.w2vtpu_flac_probe.argtypes = [
            _u8p, i64, _i64p,
            ctypes.POINTER(i32), ctypes.POINTER(i32), ctypes.POINTER(i32),
        ]
        lib.w2vtpu_flac_probe.restype = ctypes.c_int
        lib.w2vtpu_flac_decode.argtypes = [_u8p, i64, _i32p, i64, _i64p]
        lib.w2vtpu_flac_decode.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _as_u8(data: bytes) -> Tuple[np.ndarray, _u8p]:
    buf = np.frombuffer(data, dtype=np.uint8)
    return buf, buf.ctypes.data_as(_u8p)


def probe(data: bytes) -> Tuple[int, int, int, int]:
    """-> (total_samples_per_channel, channels, sample_rate, bits)."""
    lib = load()
    if lib is None:
        raise RuntimeError(
            "native FLAC decoder unavailable (no compiler?); convert the "
            "corpus to WAV offline (see preparation/)"
        )
    buf, ptr = _as_u8(data)
    total = ctypes.c_int64()
    ch, sr, bps = ctypes.c_int32(), ctypes.c_int32(), ctypes.c_int32()
    rc = lib.w2vtpu_flac_probe(
        ptr, len(buf), ctypes.byref(total), ctypes.byref(ch),
        ctypes.byref(sr), ctypes.byref(bps),
    )
    if rc != 0:
        raise ValueError(f"FLAC probe failed: {_ERRORS.get(rc, rc)}")
    return total.value, ch.value, sr.value, bps.value


def read_flac(
    path, dtype=np.float32
) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> (samples [T] mono or [T, C], sample_rate).

    float32 output is scaled to [-1, 1) by 2^(bits-1) (torchaudio.load
    semantics); pass dtype=np.int32 for raw PCM.
    """
    data = pathlib.Path(path).read_bytes()
    total, ch, sr, bps = probe(data)
    lib = load()
    buf, ptr = _as_u8(data)
    # total may be 0 (unknown); start from a byte-size heuristic then. Well-
    # compressed streams (constant/rice frames) can decode many samples per
    # byte, so on capacity overflow (-9) with unknown total we retry with a
    # geometrically grown buffer instead of failing.
    # retry ceiling: 2^28 samples/channel (a 1 GiB int32 buffer mono —
    # 4.7 h of 16 kHz audio, far past any utterance). Without it a small
    # crafted file of constant subframes (65535 samples per ~10 bytes) with
    # unknown total drives multi-ten-GB allocations and full re-decodes.
    max_cap = 1 << 28
    cap = total if total > 0 else (len(data) * 8 // max(bps, 1) + 65536)
    cap = min(cap, max_cap)
    while True:
        out = np.empty(cap * ch, dtype=np.int32)
        written = ctypes.c_int64()
        rc = lib.w2vtpu_flac_decode(
            ptr, len(buf), out.ctypes.data_as(_i32p), cap, ctypes.byref(written)
        )
        if rc == -9 and total == 0 and cap < max_cap:
            cap = min(cap * 4, max_cap)
            continue
        if rc != 0:
            raise ValueError(f"FLAC decode failed: {_ERRORS.get(rc, rc)}")
        break
    n = written.value
    pcm = out[: n * ch].reshape(n, ch)
    if ch == 1:
        pcm = pcm[:, 0]
    if np.dtype(dtype) == np.int32:
        return pcm, sr
    return (pcm.astype(np.float32) / float(1 << (bps - 1))), sr
