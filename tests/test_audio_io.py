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
