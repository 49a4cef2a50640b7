"""Device-side log-mel frontend, XLA reference path.

This is the TPU-native re-design of the reference's offline librosa frontend
(reference: ``utils/features.py:LogMelExtractor.transform`` — librosa STFT →
|S|² → mel matmul → power_to_db; SURVEY.md §3.1 HOT LOOP #1).  Two design
changes vs the reference:

1. The whole frontend is a jittable pure function on batched waveforms, so it
   runs *on device, inside the training step* instead of as a 51k-file CPU
   preprocessing pass.  Packed HDF5 features remain supported for parity
   (``features.py`` CLI) but the fast path is waveform-in.
2. The DFT is expressed as two real matmuls against a windowed basis
   (``ops/dsp.dft_matrices``) so every FLOP of the frontend lands on the MXU.
   A fused single-HBM-round-trip Pallas kernel with the same signature lives
   in ``ops/pallas_logmel.py``; this module is the semantics reference it is
   tested against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DEFAULT
from . import dsp

__all__ = ["frame_signal", "logmel", "make_logmel_fn"]


def _pad_center(x: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    """Centered STFT padding on the last (time) axis, librosa-style."""
    cfg_pad = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg_pad, mode=mode)


def frame_signal(x: jnp.ndarray, window_size: int, hop_size: int) -> jnp.ndarray:
    """Slice ``x [..., samples]`` into overlapping frames ``[..., T, window]``.

    Static-shape gather; XLA lowers this to cheap dynamic slices.  Number of
    frames = 1 + (samples - window) // hop.
    """
    samples = x.shape[-1]
    n_frames = 1 + (samples - window_size) // hop_size
    starts = np.arange(n_frames) * hop_size                   # static
    idx = starts[:, None] + np.arange(window_size)[None, :]   # [T, W] static
    return x[..., idx]


@functools.partial(jax.jit, static_argnames=("cfg",))
def logmel(waveform: jnp.ndarray, cfg: Config = DEFAULT) -> jnp.ndarray:
    """Batched log-mel: ``[..., clip_samples] float32 -> [..., T, mel] float32``.

    Bit-matches the librosa pipeline the reference uses: center reflect pad,
    periodic Hann, power spectrogram, Slaney mel filterbank, power_to_db
    (ref=1, amin=1e-10).  Golden-tested in tests/test_dsp.py.
    """
    cos_mat = jnp.asarray(dsp.dft_matrices(cfg.window_size)[0])
    sin_mat = jnp.asarray(dsp.dft_matrices(cfg.window_size)[1])
    mel_w = jnp.asarray(
        dsp.mel_filterbank(
            cfg.sample_rate, cfg.window_size, cfg.mel_bins, cfg.fmin, cfg.fmax
        )
    )
    return _logmel_impl(waveform, cos_mat, sin_mat, mel_w, cfg)


def _logmel_impl(waveform, cos_mat, sin_mat, mel_w, cfg: Config):
    x = waveform.astype(jnp.float32)
    pad = cfg.window_size // 2
    x = _pad_center(x, pad, cfg.pad_mode)
    frames = frame_signal(x, cfg.window_size, cfg.hop_size)   # [..., T, W]
    # Windowed real DFT as two matmuls (window folded into the basis).
    # precision=HIGHEST: on TPU, f32 matmuls otherwise run through bf16
    # passes — the DFT/mel projections are part of the bit-compat contract.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, cos_mat, precision=hi)            # [..., T, F]
    im = jnp.matmul(frames, sin_mat, precision=hi)
    power = re * re + im * im                                 # |STFT|²
    mel = jnp.matmul(power, mel_w, precision=hi)              # [..., T, M]
    log_spec = 10.0 * jnp.log10(jnp.maximum(cfg.log_amin, mel))
    log_spec -= 10.0 * np.log10(max(cfg.log_amin, cfg.log_ref))
    if cfg.log_top_db is not None:
        # per-clip max over (time, mel) — clip-dependent, see SURVEY §7.
        peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - cfg.log_top_db)
    return log_spec


def make_logmel_fn(cfg: Config = DEFAULT, use_pallas: bool = False,
                   precision: str = "highest"):
    """Return a jittable ``waveform -> logmel`` closure.

    ``use_pallas=True`` selects the fused Pallas kernel (TPU only); both
    backends share this signature and are tested for agreement.
    ``precision="fast"`` uses single-pass bf16 MXU matmuls in the kernel
    (~0.02 dB noise) — right for the training hot path; feature packing
    keeps "highest" (the librosa bit-compat contract).

    Both returned closures also accept PRE-STAGED hop-chunk rows
    ``[B, n_rows, hop]`` from ``ops.pallas_logmel.prepare_chunks`` (the
    device-resident waveform-corpus fast path): the Pallas kernel consumes
    them directly (skipping its internal pad+relayout); the XLA path
    un-stages them first (``unstage_chunks`` — exact, so CPU tests and the
    graceful non-TPU fallback stay bit-consistent with 2-D input).
    """
    if use_pallas:
        if jax.default_backend() != "tpu":
            # Mosaic kernels need a real TPU; CLIs pass --use_pallas
            # unconditionally, so degrade gracefully off-TPU.
            import warnings

            warnings.warn("use_pallas requested on non-TPU backend "
                          f"({jax.default_backend()}); using the XLA path")
        else:
            from .pallas_logmel import logmel_pallas

            return functools.partial(logmel_pallas, cfg=cfg,
                                     precision=precision)

    def xla_fn(waveform):
        # staged chunk rows are recognised by their hop-sized minor axis
        # (a legitimate 2-D waveform has clip-length minor axis)
        if waveform.ndim == 3 and waveform.shape[-1] == cfg.hop_size:
            from .pallas_logmel import unstage_chunks

            waveform = unstage_chunks(waveform, cfg)
        return logmel(waveform, cfg=cfg)

    return xla_fn


def make_logmel_bank_fn(cfg: Config = DEFAULT, use_pallas: bool = False,
                        precision: str = "fast",
                        wave_scale: float | None = None):
    """Return a jittable ``(bank, idx) -> logmel`` closure over a
    device-resident chunk-row corpus bank (``prepare_chunks`` layout,
    f32 or quantized int16 + ``wave_scale``).

    The Pallas path gathers INSIDE the kernel via a scalar-prefetched
    index map and decodes int16 on the VPU with the PCM scale folded
    into the DFT basis (``logmel_pallas_bank`` — no materialized batch,
    no decoded f32 copy). The XLA fallback is the explicit formulation:
    ``jnp.take`` → decode → un-stage → ``logmel`` — bit-consistent, so
    CPU tests and non-TPU runs see identical numerics to 2-D input.
    """
    if use_pallas and jax.default_backend() == "tpu":
        from .pallas_logmel import logmel_pallas_bank

        return functools.partial(logmel_pallas_bank, cfg=cfg,
                                 precision=precision,
                                 wave_scale=wave_scale)

    from .pallas_logmel import unstage_chunks

    def xla_bank_fn(bank, idx):
        rows = jnp.take(bank, idx, axis=0)
        if jnp.issubdtype(rows.dtype, jnp.integer):
            if wave_scale is None:
                raise ValueError("integer bank needs wave_scale to decode")
            rows = rows.astype(jnp.float32) * jnp.float32(wave_scale)
        return logmel(unstage_chunks(rows, cfg), cfg=cfg)

    return xla_bank_fn
