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
