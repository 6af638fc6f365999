"""ctypes loader for the native DSP library (native/dsp.cpp).

Builds `native/libw2vtpu_dsp.so` on demand (make + g++, no external deps)
and exposes the C functions with numpy signatures. Every entry point has a
pure-numpy/scipy fallback in `data/augment.py`; absence of a compiler or a
failed build silently degrades to the fallbacks (`available()` reports
which path is active).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["available", "upfirdn", "fir_same", "fft_convolve", "load"]

_NATIVE_DIR = pathlib.Path(__file__).parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libw2vtpu_dsp.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_f32p = ctypes.POINTER(ctypes.c_float)
_i16p = ctypes.POINTER(ctypes.c_int16)


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
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
        i64 = ctypes.c_int64
        lib.w2vtpu_upfirdn.argtypes = [
            _f32p, i64, _f32p, i64, i64, i64, _f32p, i64,
        ]
        lib.w2vtpu_fir_same.argtypes = [_f32p, i64, _f32p, i64, _f32p]
        lib.w2vtpu_fft_convolve.argtypes = [_f32p, i64, _f32p, i64, _f32p]
        lib.w2vtpu_pcm16_to_f32.argtypes = [_i16p, i64, _f32p]
        lib.w2vtpu_abi_version.restype = ctypes.c_int
        if lib.w2vtpu_abi_version() != 1:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_f32p)


def upfirdn(
    x: np.ndarray, taps: np.ndarray, up: int, down: int
) -> Optional[np.ndarray]:
    """Polyphase resample core (scipy.signal.upfirdn semantics, trimmed by
    the caller). Returns None when the native lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    taps = np.ascontiguousarray(taps, np.float32)
    # scipy.signal.upfirdn output length
    ny = ((x.shape[0] - 1) * up + taps.shape[0] + down - 1) // down
    y = np.empty(ny, np.float32)
    lib.w2vtpu_upfirdn(
        _ptr(x), x.shape[0], _ptr(taps), taps.shape[0], up, down, _ptr(y), ny
    )
    return y


def fir_same(x: np.ndarray, taps: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    taps = np.ascontiguousarray(taps, np.float32)
    y = np.empty_like(x)
    lib.w2vtpu_fir_same(_ptr(x), x.shape[0], _ptr(taps), taps.shape[0], _ptr(y))
    return y


def fft_convolve(x: np.ndarray, h: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    h = np.ascontiguousarray(h, np.float32)
    y = np.empty(x.shape[0] + h.shape[0] - 1, np.float32)
    lib.w2vtpu_fft_convolve(_ptr(x), x.shape[0], _ptr(h), h.shape[0], _ptr(y))
    return y
