"""C++ audio-ingest library vs the pure-Python path (build + parity)."""

import numpy as np
import pytest
from scipy.signal import resample_poly as sp_resample

from sound_event_detection_dcase2017_task4_tpu import audio_io, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not buildable here")


def test_resample_matches_scipy():
    rng = np.random.RandomState(0)
    x = (rng.randn(44100) * 0.3).astype(np.float32)
    y_n = native.resample(x, 44100, 32000)
    y_s = sp_resample(x.astype(np.float64), 320, 441).astype(np.float32)
    m = min(len(y_n), len(y_s))
    assert abs(len(y_n) - len(y_s)) <= 1
    np.testing.assert_allclose(y_n[:m], y_s[:m], atol=1e-6)


def test_resample_upsample():
    rng = np.random.RandomState(1)
    x = (rng.randn(16000) * 0.3).astype(np.float32)
    y_n = native.resample(x, 16000, 32000)
    y_s = sp_resample(x.astype(np.float64), 2, 1).astype(np.float32)
    m = min(len(y_n), len(y_s))
    np.testing.assert_allclose(y_n[:m], y_s[:m], atol=1e-6)


def test_load_wav_matches_python(tmp_path):
    rng = np.random.RandomState(2)
    x = (rng.randn(44100) * 0.2).astype(np.float32)
    path = str(tmp_path / "a.wav")
    audio_io.save_wav(path, x, 44100)

    w_n = native.load_wav(path, 32000, 32000)
    w_p, _ = audio_io.load_wav(path, target_sr=32000)
    w_p = np.pad(w_p[:32000], (0, max(0, 32000 - len(w_p))))
    np.testing.assert_allclose(w_n, w_p, atol=1e-5)


def test_load_batch(tmp_path):
    rng = np.random.RandomState(3)
    paths = []
    refs = []
    for i in range(5):
        x = (rng.randn(8000) * 0.2).astype(np.float32)
        p = str(tmp_path / f"{i}.wav")
        audio_io.save_wav(p, x, 32000)
        paths.append(p)
        refs.append(np.pad(x, (0, 8000)))      # padded to 16000
    out = native.load_wav_batch(paths, 32000, 16000, num_threads=2)
    assert out.shape == (5, 16000)
    for i in range(5):
        np.testing.assert_allclose(out[i], refs[i], atol=1e-4)


def test_load_batch_missing_file(tmp_path):
    with pytest.raises(IOError):
        native.load_wav_batch([str(tmp_path / "nope.wav")], 32000, 100)


def _write_extensible_float_wav(path, x, sr):
    """WAVE_FORMAT_EXTENSIBLE container with an IEEE-float SubFormat GUID."""
    import struct

    data = np.asarray(x, np.float32).tobytes()
    guid = bytes([0x03, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
                  0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71])
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 1, sr, sr * 4, 4, 32, 22, 32,
                      0) + guid
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
                + chunks)


def test_load_extensible_float_wav(tmp_path):
    """A WAVE_FORMAT_EXTENSIBLE float32 file must be decoded as float, not
    misread as int32 PCM (ADVICE.md round 1: the SubFormat GUID carries the
    real format code)."""
    rng = np.random.RandomState(4)
    x = (rng.randn(8000) * 0.2).astype(np.float32)
    path = str(tmp_path / "ext.wav")
    _write_extensible_float_wav(path, x, 32000)
    w = native.load_wav(path, 32000, 8000)
    np.testing.assert_allclose(w, x, atol=1e-6)
