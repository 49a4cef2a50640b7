"""Golden tests for the log-mel frontend against independent oracles.

librosa is not installed (SURVEY.md §7), so the oracles are:
  * scipy (hann window, exact FFT via numpy.fft) — independent STFT math;
  * torch.stft — a second independent STFT implementation;
  * hand-computed Slaney mel filterbank edge values.
These pin the same published math librosa implements.
"""

import numpy as np
import pytest
import scipy.signal

from sound_event_detection_dcase2017_task4_tpu import config
from sound_event_detection_dcase2017_task4_tpu.ops import dsp


def test_hann_matches_scipy():
    w = dsp.hann_window(1024)
    ref = scipy.signal.get_window("hann", 1024, fftbins=True)
    np.testing.assert_allclose(w, ref, atol=1e-7)


def test_mel_scale_roundtrip():
    f = np.array([0.0, 50.0, 440.0, 999.9, 1000.0, 4000.0, 14000.0, 16000.0])
    np.testing.assert_allclose(dsp.mel_to_hz(dsp.hz_to_mel(f)), f, rtol=1e-12)
    # Slaney anchor points: 1000 Hz maps to mel 15 (linear 200/3 Hz per mel).
    assert abs(dsp.hz_to_mel(1000.0) - 15.0) < 1e-12
    assert abs(dsp.hz_to_mel(200.0 / 3) - 1.0) < 1e-12


def test_mel_filterbank_properties():
    mel_w = dsp.mel_filterbank(32000, 1024, 64, 50.0, 14000.0)
    assert mel_w.shape == (513, 64)
    assert mel_w.dtype == np.float32
    assert (mel_w >= 0).all()
    # Each filter is nonempty and unimodal triangular.
    assert (mel_w.sum(axis=0) > 0).all()
    # Filters vanish outside [fmin, fmax].
    freqs = np.linspace(0, 16000, 513)
    outside = (freqs < 45.0) | (freqs > 14005.0)
    assert np.abs(mel_w[outside]).max() == 0.0
    # Slaney normalization: filter areas ≈ 2 / bandwidth; check total energy
    # response of an all-ones power spectrum is finite and smooth.
    resp = mel_w.sum(axis=0)
    assert resp.std() / resp.mean() < 1.0


def test_mel_filterbank_matches_torchaudio_style_oracle():
    """Cross-check against an independently-coded Slaney filterbank."""
    sr, n_fft, n_mels, fmin, fmax = 32000, 1024, 64, 50.0, 14000.0
    mel_w = dsp.mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

    # Independent oracle: build from first principles with different code path.
    def hz2mel(f):
        f = np.asarray(f, dtype=np.float64)
        lin = f / (200.0 / 3)
        log_region = f >= 1000.0
        out = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (np.log(6.4) / 27.0), lin
        )
        return out

    def mel2hz(m):
        m = np.asarray(m, dtype=np.float64)
        lin = m * (200.0 / 3)
        out = np.where(m >= 15.0, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), lin)
        return out

    edges = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    oracle = np.zeros((n_fft // 2 + 1, n_mels))
    for m in range(n_mels):
        lo, ce, hi = edges[m], edges[m + 1], edges[m + 2]
        rising = (freqs - lo) / (ce - lo)
        falling = (hi - freqs) / (hi - ce)
        tri = np.maximum(0.0, np.minimum(rising, falling))
        oracle[:, m] = tri * (2.0 / (hi - lo))
    np.testing.assert_allclose(mel_w, oracle, atol=1e-6)


def test_power_to_db():
    S = np.array([[1.0, 10.0, 1e-12]])
    out = dsp.power_to_db(S, ref=1.0, amin=1e-10)
    np.testing.assert_allclose(out, [[0.0, 10.0, -100.0]], atol=1e-6)
    out2 = dsp.power_to_db(S, top_db=80.0)
    assert out2.min() >= out2.max() - 80.0


def test_dft_matrices_match_rfft():
    rng = np.random.RandomState(0)
    frame = rng.randn(1024).astype(np.float64)
    cos_m, sin_m = dsp.dft_matrices(1024, dtype=np.float64)
    w = dsp.hann_window(1024, dtype=np.float64)
    ref = np.fft.rfft(frame * w)
    re = frame @ cos_m
    im = frame @ sin_m
    np.testing.assert_allclose(re, ref.real, atol=1e-9)
    np.testing.assert_allclose(-im, ref.imag, atol=1e-9)
    np.testing.assert_allclose(re**2 + im**2, np.abs(ref) ** 2, atol=1e-8)


class TestLogmelJax:
    @pytest.fixture(scope="class")
    def wave(self):
        rng = np.random.RandomState(42)
        # 2 synthetic clips: tone + noise, 1 second for test speed.
        t = np.arange(32000) / 32000.0
        c0 = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.randn(32000)
        c1 = 0.3 * np.sin(2 * np.pi * 4000 * t) + 0.05 * rng.randn(32000)
        return np.stack([c0, c1]).astype(np.float32)

    def _oracle_logmel(self, wave_1d, cfg):
        """Independent numpy oracle: librosa-semantics STFT via np.fft."""
        pad = cfg.window_size // 2
        x = np.pad(wave_1d.astype(np.float64), pad, mode="reflect")
        w = dsp.hann_window(cfg.window_size, dtype=np.float64)
        n_frames = 1 + len(wave_1d) // cfg.hop_size
        frames = np.stack(
            [
                x[i * cfg.hop_size : i * cfg.hop_size + cfg.window_size]
                for i in range(n_frames)
            ]
        )
        spec = np.abs(np.fft.rfft(frames * w, axis=-1)) ** 2
        mel_w = dsp.mel_filterbank(
            cfg.sample_rate, cfg.window_size, cfg.mel_bins, cfg.fmin, cfg.fmax,
            dtype=np.float64,
        )
        mel = spec @ mel_w
        return dsp.power_to_db(mel, ref=cfg.log_ref, amin=cfg.log_amin)

    def test_logmel_matches_numpy_oracle(self, wave):
        from sound_event_detection_dcase2017_task4_tpu.ops import stft

        cfg = config.Config(clip_samples=32000)
        out = np.asarray(stft.logmel(wave, cfg))
        assert out.shape == (2, 101, 64)
        for i in range(2):
            ref = self._oracle_logmel(wave[i], cfg)
            # float32 matmul DFT vs float64 FFT: agree to ~1e-3 dB after log.
            np.testing.assert_allclose(out[i], ref, atol=2e-3, rtol=0)

    def test_logmel_matches_torch_stft(self, wave):
        import torch

        from sound_event_detection_dcase2017_task4_tpu.ops import stft

        cfg = config.Config(clip_samples=32000)
        out = np.asarray(stft.logmel(wave, cfg))

        xt = torch.from_numpy(wave).double()
        win = torch.hann_window(cfg.window_size, periodic=True, dtype=torch.float64)
        S = torch.stft(
            xt,
            n_fft=cfg.window_size,
            hop_length=cfg.hop_size,
            window=win,
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        power = (S.abs() ** 2).transpose(1, 2).numpy()  # [B, T, F]
        mel_w = dsp.mel_filterbank(
            cfg.sample_rate, cfg.window_size, cfg.mel_bins, cfg.fmin, cfg.fmax,
            dtype=np.float64,
        )
        ref = dsp.power_to_db(power @ mel_w, ref=cfg.log_ref, amin=cfg.log_amin)
        np.testing.assert_allclose(out, ref, atol=2e-3, rtol=0)

    def test_full_clip_shape(self):
        from sound_event_detection_dcase2017_task4_tpu.ops import stft

        cfg = config.DEFAULT
        wave = np.zeros((1, cfg.clip_samples), np.float32)
        out = stft.logmel(wave, cfg)
        assert out.shape == (1, cfg.frames_num, cfg.mel_bins)  # (1, 1001, 64)
