"""Minimal audio I/O: WAV decode + polyphase resample (no librosa/soundfile).

The reference loads audio with ``librosa.core.load(path, sr=32000, mono=True)``
(SURVEY.md §3.1). Neither librosa nor soundfile exists in this image, so WAV
decoding uses the stdlib ``wave`` module (PCM 8/16/24/32-bit + float32) and
resampling uses ``scipy.signal.resample_poly`` (polyphase, the same method
librosa's ``res_type='polyphase'`` uses). Non-WAV containers are out of
scope — DCASE distributions ship WAV.
"""

from __future__ import annotations

import wave
from fractions import Fraction

import numpy as np
from scipy import signal as sps

__all__ = ["load_wav", "save_wav", "resample"]


def load_wav(path: str, target_sr: int | None = None,
             mono: bool = True) -> tuple[np.ndarray, int]:
    """Read a WAV file → (float32 waveform in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())

    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        # could be int32 PCM or float32; WAVE_FORMAT tag isn't exposed by
        # `wave`, so use the int32 convention (DCASE ships 16-bit anyway).
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")

    if n_ch > 1:
        x = x.reshape(-1, n_ch)
        if mono:
            x = x.mean(axis=1)

    if target_sr is not None and target_sr != sr:
        x = resample(x, sr, target_sr)
        sr = target_sr
    return np.ascontiguousarray(x, dtype=np.float32), sr


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (librosa res_type='polyphase' equivalent)."""
    frac = Fraction(target_sr, orig_sr).limit_denominator(1000)
    return sps.resample_poly(x, frac.numerator, frac.denominator,
                             axis=0).astype(np.float32)


def save_wav(path: str, x: np.ndarray, sr: int) -> None:
    """Write mono float32 [-1, 1] as 16-bit PCM WAV (for synthetic corpora)."""
    pcm = np.clip(np.round(np.asarray(x) * 32767.0), -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
