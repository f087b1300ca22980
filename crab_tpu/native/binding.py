"""ctypes binding for the native media library (libcrabmedia.so).

Compiled on first use with g++ (no pybind11 in this image); falls back to
the pure-numpy path in crab_tpu/media/audio.py when the toolchain is
unavailable. Set CRAB_TPU_NO_NATIVE=1 to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "crabmedia.cpp")
_LIB = os.path.join(_HERE, "libcrabmedia.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC, "-ldl"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("CRAB_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.crab_load_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.crab_load_wav.restype = ctypes.c_int
        lib.crab_load_audio.argtypes = lib.crab_load_wav.argtypes
        lib.crab_load_audio.restype = ctypes.c_int
        lib.crab_has_mp3.restype = ctypes.c_int
        lib.crab_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _call_loader(fn, path: str, sr: int, duration: Optional[float]) -> np.ndarray:
    out = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_long()
    rc = fn(
        path.encode(), sr, float(duration or -1.0), ctypes.byref(out), ctypes.byref(out_len)
    )
    if rc == 1:
        raise FileNotFoundError(path)
    if rc != 0:
        raise ValueError(f"crabmedia failed to parse {path} (rc={rc})")
    try:
        arr = np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib_free = _load().crab_free
        lib_free(out)
    return arr.astype(np.float32)


def load_wav(path: str, sr: int = 16000, duration: Optional[float] = None) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native crabmedia unavailable")
    return _call_loader(lib.crab_load_wav, path, sr, duration)


def load_audio(path: str, sr: int = 16000, duration: Optional[float] = None) -> np.ndarray:
    """Any supported format: WAV natively, MPEG audio (.mp3) through the
    system codec (libmpg123, dlopen'd)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native crabmedia unavailable")
    return _call_loader(lib.crab_load_audio, path, sr, duration)


def has_mp3() -> bool:
    lib = _load()
    return bool(lib is not None and lib.crab_has_mp3())
