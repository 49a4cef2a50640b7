"""WAV decode + resample (audio_io) and the real-file features CLI path."""

import os

import numpy as np
import pytest

from sound_event_detection_dcase2017_task4_tpu import audio_io, features


def test_wav_roundtrip(tmp_path):
    sr = 32000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "tone.wav")
    audio_io.save_wav(path, x, sr)
    y, sr2 = audio_io.load_wav(path)
    assert sr2 == sr
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)   # 16-bit quantization


def test_resample_preserves_tone(tmp_path):
    sr_in, sr_out = 44100, 32000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = audio_io.resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 2
    # dominant frequency still 1 kHz after resampling
    spec = np.abs(np.fft.rfft(y[: sr_out]))
    peak_hz = np.argmax(spec) * sr_out / sr_out
    assert abs(peak_hz - 1000) < 5


def test_load_wav_with_target_sr(tmp_path):
    sr = 16000
    x = np.random.RandomState(0).randn(sr).astype(np.float32) * 0.1
    path = str(tmp_path / "x.wav")
    audio_io.save_wav(path, x, sr)
    y, sr2 = audio_io.load_wav(path, target_sr=32000)
    assert sr2 == 32000
    assert abs(len(y) - 32000) <= 2


def test_features_cli_from_wav_files(tmp_path):
    """The real-dataset path: WAVs on disk + metadata CSV → packed HDF5."""
    ws = str(tmp_path / "ws")
    # synthetic corpus WITH wav files (no --metadata_only)
    features.main([
        "pack_synthetic", f"--workspace={ws}",
        "--num_train=4", "--num_test=2", "--num_eval=2",
        "--clip_seconds=0.5",
    ])
    dataset_dir = os.path.join(ws, "synth_dataset")
    assert os.path.isfile(os.path.join(
        dataset_dir, "audio", "training", "synth_00000.wav"))

    # re-pack the training split from the WAV files through the CLI
    ws2 = str(tmp_path / "ws2")
    features.main([
        "calculate_feature_for_all_audio_files",
        f"--dataset_dir={dataset_dir}", f"--workspace={ws2}",
        "--data_type=training", "--batch_size=2", "--clip_seconds=0.5",
    ])
    from sound_event_detection_dcase2017_task4_tpu.data import read_split

    r1 = read_split(os.path.join(ws, "features", "training.h5"))
    r2 = read_split(os.path.join(ws2, "features", "training.h5"))
    assert r2.feature.shape == r1.feature.shape
    # same features modulo 16-bit WAV quantization of the waveform
    assert np.median(np.abs(r1.feature - r2.feature)) < 0.05


class TestWeakMetadataParsing:
    """Labels containing commas must survive both separator styles."""

    def test_comma_containing_labels(self, tmp_path):
        from sound_event_detection_dcase2017_task4_tpu.config import lb_to_idx
        from sound_event_detection_dcase2017_task4_tpu.features import (
            read_weak_metadata)

        meta = tmp_path / "m.csv"
        meta.write_text(
            "a.wav\tAir horn, truck horn\n"
            "b.wav\tCar,Air horn, truck horn\n"
            "c.wav\tFire engine, fire truck (siren);Train\n"
            'd.wav\t"Train horn,Car"\n'
            "e.wav\tBogus label,Car\n")
        names, targets = read_weak_metadata(str(meta))
        assert names == ["a.wav", "b.wav", "c.wav", "d.wav", "e.wav"]
        assert targets[0, lb_to_idx["Air horn, truck horn"]] == 1
        assert targets[0].sum() == 1
        assert targets[1, lb_to_idx["Car"]] == 1
        assert targets[1, lb_to_idx["Air horn, truck horn"]] == 1
        assert targets[1].sum() == 2
        assert targets[2, lb_to_idx["Fire engine, fire truck (siren)"]] == 1
        assert targets[2, lb_to_idx["Train"]] == 1
        assert targets[3, lb_to_idx["Train horn"]] == 1
        assert targets[3, lb_to_idx["Car"]] == 1
        assert targets[4].sum() == 1          # bogus fragment skipped

    def test_synth_metadata_roundtrip(self, tmp_path):
        import numpy as np

        from sound_event_detection_dcase2017_task4_tpu import features
        from sound_event_detection_dcase2017_task4_tpu.data import read_split

        ws = str(tmp_path / "ws")
        features.main([
            "pack_synthetic", f"--workspace={ws}", "--num_train=30",
            "--num_test=2", "--num_eval=2", "--clip_seconds=0.5",
            "--metadata_only"])
        names, targets = features.read_weak_metadata(
            f"{ws}/synth_dataset/metadata/training_set.csv")
        packed = read_split(f"{ws}/features/training.h5")
        assert names == packed.audio_names
        np.testing.assert_array_equal(targets, packed.target)


def test_load_extensible_float_wav_python_path(tmp_path):
    """The pure-Python loader must resolve WAVE_FORMAT_EXTENSIBLE float32
    via the SubFormat GUID, same as the native parser."""
    from test_native import _write_extensible_float_wav

    rng = np.random.RandomState(5)
    x = (rng.randn(4000) * 0.2).astype(np.float32)
    path = str(tmp_path / "ext.wav")
    _write_extensible_float_wav(path, x, 32000)
    w, sr = audio_io.load_wav(path)
    assert sr == 32000
    np.testing.assert_allclose(w, x, atol=1e-7)


def test_load_plain_float_wav_python_path(tmp_path):
    """Plain (non-extensible) IEEE-float WAV decodes as float, not int32."""
    import struct

    rng = np.random.RandomState(6)
    x = (rng.randn(1000) * 0.3).astype(np.float32)
    data = x.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    path = str(tmp_path / "f32.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
                + chunks)
    w, sr = audio_io.load_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(w, x, atol=1e-7)


class TestMalformedAndExoticWavs:
    """RIFF-parser robustness: clean errors for garbage, graceful handling
    of legal-but-unusual containers (both the python path and, where
    loadable, the native C++ parser — mirrors native/sedx_native.cc)."""

    def _native(self):
        from sound_event_detection_dcase2017_task4_tpu import native
        return native if native.available() else None

    def test_garbage_bytes_raise(self, tmp_path):
        p = tmp_path / "junk.wav"
        p.write_bytes(b"\x00\x01\x02" * 100)
        with pytest.raises(ValueError):
            audio_io.load_wav(str(p))
        nat = self._native()
        if nat is not None:
            with pytest.raises(IOError):
                nat.load_wav(str(p), 32000, 32000)

    def test_riff_header_only_raises(self, tmp_path):
        p = tmp_path / "empty.wav"
        p.write_bytes(b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE")
        with pytest.raises(ValueError):
            audio_io.load_wav(str(p))

    def test_truncated_data_chunk_loads_available_samples(self, tmp_path):
        sr, n = 16000, 1000
        x = (np.sin(np.linspace(0, 40, n)) * 0.5).astype(np.float32)
        p = tmp_path / "trunc.wav"
        audio_io.save_wav(str(p), x, sr)
        full = p.read_bytes()
        p.write_bytes(full[: len(full) - 800])      # chop 400 samples
        y, got_sr = audio_io.load_wav(str(p))
        assert got_sr == sr
        assert len(y) == n - 400
        np.testing.assert_allclose(y, x[: n - 400], atol=1e-4)

    def test_fmt_chunk_after_data_chunk(self, tmp_path):
        """Chunk order is not mandated by RIFF; fmt-after-data must parse."""
        sr, n = 8000, 256
        x = (np.cos(np.linspace(0, 10, n)) * 0.25).astype(np.float32)
        pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
        import struct as st
        fmt = st.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
        data = pcm.tobytes()
        body = (b"data" + st.pack("<I", len(data)) + data
                + b"fmt " + st.pack("<I", len(fmt)) + fmt)
        p = tmp_path / "swapped.wav"
        p.write_bytes(b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body)
        y, got_sr = audio_io.load_wav(str(p))
        assert got_sr == sr
        np.testing.assert_allclose(y, x, atol=1e-4)

    @pytest.mark.parametrize("bits", [8, 24, 32])
    def test_pcm_widths(self, tmp_path, bits):
        sr, n = 16000, 512
        rng = np.random.RandomState(0)
        x = np.clip(rng.randn(n) * 0.3, -0.99, 0.99).astype(np.float32)
        import struct as st
        if bits == 8:
            data = (np.clip(np.round(x * 128.0), -128, 127) + 128
                    ).astype(np.uint8).tobytes()
        elif bits == 24:
            v = np.clip(np.round(x * (1 << 23)), -(1 << 23),
                        (1 << 23) - 1).astype(np.int32)
            b = np.zeros((n, 3), np.uint8)
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            data = b.tobytes()
        else:
            v = np.clip(np.round(x * (1 << 31)), -(1 << 31),
                        (1 << 31) - 1).astype("<i4")
            data = v.tobytes()
        fmt = st.pack("<HHIIHH", 1, 1, sr, sr * bits // 8, bits // 8, bits)
        body = (b"fmt " + st.pack("<I", len(fmt)) + fmt
                + b"data" + st.pack("<I", len(data)) + data)
        p = tmp_path / f"pcm{bits}.wav"
        p.write_bytes(b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body)
        y, got_sr = audio_io.load_wav(str(p))
        assert got_sr == sr
        tol = {8: 1e-2, 24: 1e-6, 32: 1e-7}[bits]
        np.testing.assert_allclose(y, x, atol=tol)


def test_compressed_wav_tags_rejected(tmp_path):
    """mu-law/a-law/ADPCM must raise, not silently decode as PCM garbage."""
    import struct as st
    for tag in (2, 6, 7, 17):
        fmt = st.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        data = bytes(range(64))
        body = (b"fmt " + st.pack("<I", len(fmt)) + fmt
                + b"data" + st.pack("<I", len(data)) + data)
        p = tmp_path / f"tag{tag}.wav"
        p.write_bytes(b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body)
        with pytest.raises(ValueError, match="format tag"):
            audio_io.load_wav(str(p))


def test_truncated_stereo_trims_to_whole_frames(tmp_path):
    """A stereo file cut mid-frame must trim to whole frames (the reshape
    to [n, channels] used to crash on an odd sample count)."""
    import struct as st
    sr, n = 8000, 100
    rng = np.random.RandomState(0)
    x = np.clip(rng.randn(n, 2) * 0.3, -0.99, 0.99).astype(np.float32)
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    fmt = st.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16)
    data = pcm.tobytes()[:-2]                  # chop one int16: half a frame
    body = (b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", len(data)) + data)
    p = tmp_path / "stereo_trunc.wav"
    p.write_bytes(b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body)
    y, got_sr = audio_io.load_wav(str(p))      # mono mean of both channels
    assert got_sr == sr
    assert len(y) == n - 1
    np.testing.assert_allclose(y, x[: n - 1].mean(axis=1), atol=1e-4)
