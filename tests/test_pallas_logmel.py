"""Fused Pallas log-mel kernel vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_dcase2017_task4_tpu import config
from sound_event_detection_dcase2017_task4_tpu.ops import stft
from sound_event_detection_dcase2017_task4_tpu.ops.pallas_logmel import logmel_pallas


@pytest.fixture(scope="module")
def wave():
    rng = np.random.RandomState(7)
    t = np.arange(32000) / 32000.0
    clips = [
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.randn(32000),
        0.2 * np.sin(2 * np.pi * 2000 * t) * np.sin(2 * np.pi * 3 * t),
        rng.randn(32000) * 0.1,
    ]
    return np.stack(clips).astype(np.float32)


def test_pallas_matches_xla_reference(wave):
    cfg = config.Config(clip_samples=32000)
    ref = np.asarray(stft.logmel(wave, cfg))
    out = np.asarray(logmel_pallas(wave, cfg, interpret=True))
    assert out.shape == ref.shape == (3, 101, 64)
    # dB domain: f32 segment-sum ordering noise is amplified by log10 on
    # near-zero mel bins; 0.05 dB bounds it. Linear domain must agree tightly.
    np.testing.assert_allclose(out, ref, atol=1e-1, rtol=0)
    np.testing.assert_allclose(
        10.0 ** (out / 10.0), 10.0 ** (ref / 10.0), rtol=2e-3, atol=1e-10
    )


def test_pallas_full_clip_shape(wave):
    cfg = config.DEFAULT
    x = np.tile(wave[:1], (1, 10)).astype(np.float32)  # 10 s clip
    assert x.shape == (1, cfg.clip_samples)
    out = np.asarray(logmel_pallas(x, cfg, interpret=True))
    assert out.shape == (1, cfg.frames_num, cfg.mel_bins)
    ref = np.asarray(stft.logmel(x, cfg))
    np.testing.assert_allclose(out, ref, atol=1e-1, rtol=0)


def test_pallas_top_db_matches_xla(wave):
    """Per-clip top_db clamping (librosa power_to_db semantics) — an XLA
    post-pass over the kernel output (round 1 gated this variant out)."""
    cfg = config.Config(clip_samples=32000, log_top_db=15.0)
    ref = np.asarray(stft.logmel(wave, cfg))
    out = np.asarray(logmel_pallas(wave, cfg, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-1, rtol=0)
    # the clamp actually bit (silence floor pulled up to peak - top_db)
    for i in range(out.shape[0]):
        assert out[i].min() >= out[i].max() - 15.0 - 1e-4
        assert np.isclose(out[i].min(), out[i].max() - 15.0, atol=1.0)


@pytest.mark.parametrize("win,hop,mel", [(640, 200, 32), (512, 160, 40),
                                         (2048, 640, 128)])
def test_pallas_generalizes_across_dsp_configs(win, hop, mel):
    """The kernel plan (n_seg, lane padding) must adapt to any window/hop."""
    cfg = config.Config(clip_samples=16000, window_size=win, hop_size=hop,
                        mel_bins=mel, fmax=15000)
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 16000) * 0.2).astype(np.float32)
    ref = np.asarray(stft.logmel(x, cfg))
    out = np.asarray(logmel_pallas(x, cfg, interpret=True))
    assert out.shape == ref.shape == (2, 1 + 16000 // hop, mel)
    np.testing.assert_allclose(out, ref, atol=1e-1, rtol=0)
    np.testing.assert_allclose(10.0 ** (out / 10.0), 10.0 ** (ref / 10.0),
                               rtol=2e-3, atol=1e-10)


def test_pallas_bin_trim_is_exact_at_fmax_nyquist():
    """The zero-mel-weight spectrum-bin trim must be output-exact even when
    fmax == Nyquist (the top Slaney triangle's edge weight is zero, so the
    Nyquist bin itself is legitimately dropped) and must match XLA."""
    cfg = config.Config(clip_samples=16000, fmax=16000)
    rng = np.random.RandomState(1)
    x = (rng.randn(2, 16000) * 0.2).astype(np.float32)
    ref = np.asarray(stft.logmel(x, cfg))
    out = np.asarray(logmel_pallas(x, cfg, interpret=True))
    np.testing.assert_allclose(10.0 ** (out / 10.0), 10.0 ** (ref / 10.0),
                               rtol=2e-3, atol=1e-10)

    from sound_event_detection_dcase2017_task4_tpu.ops.pallas_logmel import _plan
    f_half = _plan(cfg)[2]
    n_freq = cfg.window_size // 2 + 1
    # the zero-weight Nyquist bin is trimmed (512 kept of 513), which
    # saves the full 128-lane tile the 513th bin would otherwise force
    assert f_half == 512, f_half
    assert n_freq == 513
    # DEFAULT (fmax=14 kHz, ~450 live bins) lane-rounds to the same tile
    assert _plan(config.DEFAULT)[2] == 512


def test_pallas_prechunked_input_is_bit_exact(wave):
    """The 3-D pre-staged path (prepare_chunks + chunked input) must produce
    the BIT-SAME output as the 2-D path — it is the identical kernel with the
    pad/relayout hoisted out (the device-cache fast path)."""
    from sound_event_detection_dcase2017_task4_tpu.ops.pallas_logmel import (
        prepare_chunks)

    cfg = config.Config(clip_samples=32000)
    ref = np.asarray(logmel_pallas(wave, cfg, interpret=True))
    chunks = prepare_chunks(wave, cfg)
    assert chunks.ndim == 3 and chunks.shape[0] == wave.shape[0]
    assert chunks.shape[2] == cfg.hop_size
    out = np.asarray(logmel_pallas(chunks, cfg, interpret=True))
    np.testing.assert_array_equal(out, ref)

    # shape validation: wrong row count must fail loudly, not mis-decode
    with pytest.raises(ValueError, match="prepare_chunks"):
        logmel_pallas(chunks[:, :-1], cfg, interpret=True)


def test_prepare_chunks_preserves_int16():
    """An int16 quantized corpus can be staged chunked (device cache) and
    decoded on device — prepare_chunks must not silently upcast."""
    from sound_event_detection_dcase2017_task4_tpu.ops.pallas_logmel import (
        prepare_chunks)

    cfg = config.Config(clip_samples=32000)
    rng = np.random.RandomState(3)
    q = (rng.randn(2, 32000) * 8000).clip(-32768, 32767).astype(np.int16)
    chunks = prepare_chunks(q, cfg)
    assert chunks.dtype == np.int16
    # chunked-then-decoded == decoded-then-chunked (pad of zeros commutes
    # with the linear dequant scale)
    scale = np.float32(1.0 / 32768.0)
    a = chunks.astype(np.float32) * scale
    b = prepare_chunks((q.astype(np.float32) * scale), cfg)
    np.testing.assert_array_equal(a, b)


def test_pallas_bank_gather_is_bit_exact(wave):
    """logmel_pallas_bank (scalar-prefetch in-kernel gather + in-kernel
    int16 decode with the PCM scale folded into the basis) must be
    BIT-exact vs gather-then-kernel: the fold is a pure exponent shift
    (2^-15), and the index map only changes WHICH rows DMA to VMEM."""
    from sound_event_detection_dcase2017_task4_tpu.ops.pallas_logmel import (
        logmel_pallas_bank, prepare_chunks)

    cfg = config.Config(clip_samples=32000)
    q = np.clip(np.round(wave * 32768), -32768, 32767).astype(np.int16)
    scale = 1.0 / 32768.0
    dec = q.astype(np.float32) * scale
    idx = np.array([1, 0, 1], np.int32)          # duplicate row included
    ref = np.asarray(logmel_pallas(dec[idx], cfg, interpret=True,
                                   precision="fast"))

    out_f32 = np.asarray(logmel_pallas_bank(
        jnp.asarray(prepare_chunks(dec, cfg)), jnp.asarray(idx), cfg,
        interpret=True))
    np.testing.assert_array_equal(out_f32, ref)

    out_i16 = np.asarray(logmel_pallas_bank(
        jnp.asarray(prepare_chunks(q, cfg)), jnp.asarray(idx), cfg,
        wave_scale=scale, interpret=True))
    np.testing.assert_array_equal(out_i16, ref)

    # guard rails: integer bank without a scale; non-power-of-two scale;
    # wrong chunk geometry
    with pytest.raises(ValueError, match="wave_scale"):
        logmel_pallas_bank(jnp.asarray(prepare_chunks(q, cfg)),
                           jnp.asarray(idx), cfg, interpret=True)
    with pytest.raises(ValueError, match="power of two"):
        logmel_pallas_bank(jnp.asarray(prepare_chunks(q, cfg)),
                           jnp.asarray(idx), cfg, wave_scale=1e-4,
                           interpret=True)
    with pytest.raises(ValueError, match="prepare_chunks"):
        logmel_pallas_bank(jnp.asarray(dec), jnp.asarray(idx), cfg,
                           interpret=True)


def test_pallas_rows_cover_non_hop_multiple_clips():
    """Regression: a clip length that is not a hop multiple combined with
    an 8-aligned superset window used to leave n_rows one chunk-row short
    of the centre-padded signal (negative jnp.pad width → crash)."""
    cfg = config.Config(clip_samples=16257, window_size=1152, hop_size=128,
                        fmax=15000)
    x = (np.random.RandomState(0).randn(1, 16257) * 0.2).astype(np.float32)
    out = np.asarray(logmel_pallas(x, cfg, interpret=True))
    ref = np.asarray(stft.logmel(x, cfg))
    assert out.shape == ref.shape
    np.testing.assert_allclose(10.0 ** (out / 10.0), 10.0 ** (ref / 10.0),
                               rtol=2e-3, atol=1e-10)
