"""ctypes bindings for the C++ audio-ingest library (graceful fallback).

``libsedx_native.so`` (built from ``native/sedx_native.cc`` — multithreaded
WAV decode + scipy-compatible polyphase resample) replaces the per-file
Python loader on the feature-packing hot path (reference HOT LOOP #1,
SURVEY.md §3.1). When the library is missing it is built on demand with
``make``; if that fails too, callers fall back to :mod:`audio_io` (pure
Python) — same outputs, tested for agreement in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_PKG_DIR, "libsedx_native.so")
_NATIVE_SRC_DIR = os.path.join(os.path.dirname(_PKG_DIR), "native")

_lib: Optional[ctypes.CDLL] = None
_tried = False

__all__ = ["available", "load_wav", "load_wav_batch", "resample"]


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH) and os.path.isdir(_NATIVE_SRC_DIR):
        try:
            subprocess.run(["make", "-s"], cwd=_NATIVE_SRC_DIR, check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.sedx_load_wav.restype = ctypes.c_int64
    lib.sedx_load_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.sedx_load_wav_batch.restype = ctypes.c_int64
    lib.sedx_load_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int]
    lib.sedx_resample_poly.restype = ctypes.c_int64
    lib.sedx_resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_wav(path: str, target_sr: int, max_samples: int) -> np.ndarray:
    """Decode + resample + zero-pad/truncate to ``max_samples`` (float32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.zeros(max_samples, np.float32)
    rc = lib.sedx_load_wav(path.encode(), target_sr, _fptr(out), max_samples)
    if rc < 0:
        raise IOError(f"sedx_load_wav({path!r}) failed with {rc}")
    return out


def load_wav_batch(paths: Sequence[str], target_sr: int, max_samples: int,
                   num_threads: int = 0) -> np.ndarray:
    """Parallel decode of many files → ``[n, max_samples] float32``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    out = np.zeros((n, max_samples), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.sedx_load_wav_batch(arr, n, target_sr, _fptr(out), max_samples,
                                 num_threads)
    if rc != 0:
        bad = int(-rc - 1)
        raise IOError(f"failed to load {paths[bad]!r}")
    return out


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample (scipy resample_poly-compatible design)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    from math import gcd

    g = gcd(target_sr, orig_sr)
    up, down = target_sr // g, orig_sr // g
    x = np.ascontiguousarray(x, np.float32)
    n_out = -(-len(x) * up // down)
    out = np.zeros(n_out, np.float32)
    n = lib.sedx_resample_poly(_fptr(x), len(x), up, down, _fptr(out), n_out)
    return out[:n]
