"""Fused Pallas TPU kernel: waveform → log-mel in one HBM round-trip.

TPU-native replacement for the reference's librosa frontend hot loop
(reference: ``utils/features.py:LogMelExtractor.transform`` +
``calculate_feature_for_all_audio_files``; SURVEY.md §3.1 HOT LOOP #1).
The XLA reference path (``ops/stft.py``) materialises the overlapping frame
matrix ``[B, T, window]`` (an 8× blow-up of the waveform) and the 513-bin
power spectrogram in HBM; this kernel keeps both in VMEM.

Formulation (GEMM-native NDFT, cf. PAPERS.md "MelT"):

* The centre-padded waveform is reshaped into non-overlapping *hop chunks*
  ``[n_rows, hop]`` — a free reshape, no gather. Frame ``f`` (start sample
  ``f*hop``) is exactly chunks ``f .. f+n_seg-1`` where
  ``n_seg = ceil(window / hop)`` (partial last segment zero-padded).
* The windowed real-DFT basis is split into ``n_seg`` segment matrices
  ``W_j[hop, n_freq]`` with the Hann window folded in, so for a block of
  ``F`` frames::

      Re = Σ_j  chunks[f0+j : f0+j+F, :] @ Wcos_j         (MXU matmuls)
      Im = Σ_j  chunks[f0+j : f0+j+F, :] @ Wsin_j
      logmel = log10-compress( (Re² + Im²) @ melW )

* Each grid step fetches one *windowed* chunk block
  ``[FRAME_BLOCK + n_seg, hop_pad]`` (3% row overlap between consecutive
  blocks) and slices the ``n_seg`` shifted views **in VMEM**. Round 1
  materialised a full ``n_seg``× lag stack in HBM instead; the device trace
  showed that stack costing ~5 ms/step of pure HBM traffic (805 MB written
  by ``pad_maximum_fusion`` + read back by ``slice_bitcast_fusion``) —
  4× the waveform for a tensor the kernel reads once. The windowed layout
  keeps every BlockSpec fetch aligned (rows padded to the 8-sublane tile)
  while shipping each waveform byte to VMEM ~once.

Both the hop axis (320→384) and the frequency axis (513→640) are zero-padded
to multiples of 128 lanes so every matmul and DMA tiles cleanly onto the
128×128 MXU; padding rows/columns are zero in the bases, mathematically inert.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config, DEFAULT
from . import dsp

__all__ = ["logmel_pallas"]

_FRAME_BLOCK = 128  # frames per grid step (MXU sublane-friendly)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=4)
def _plan(cfg: Config):
    """Host-side constant folding: segment DFT matrices + padded mel matrix."""
    hop, win = cfg.hop_size, cfg.window_size
    hop_pad = _round_up(hop, 128)
    n_seg = math.ceil(win / hop)
    n_freq = win // 2 + 1
    f_pad = _round_up(n_freq, 128)

    cos_m, sin_m = dsp.dft_matrices(win, dtype=np.float32)   # [win, n_freq]
    cos_seg = np.zeros((n_seg, hop_pad, f_pad), np.float32)
    sin_seg = np.zeros((n_seg, hop_pad, f_pad), np.float32)
    for j in range(n_seg):
        lo, hi = j * hop, min((j + 1) * hop, win)
        cos_seg[j, : hi - lo, :n_freq] = cos_m[lo:hi]
        sin_seg[j, : hi - lo, :n_freq] = sin_m[lo:hi]

    mel = dsp.mel_filterbank(
        cfg.sample_rate, win, cfg.mel_bins, cfg.fmin, cfg.fmax, dtype=np.float32
    )                                                        # [n_freq, mel]
    mel_pad = np.zeros((f_pad, cfg.mel_bins), np.float32)
    mel_pad[:n_freq] = mel
    return n_seg, hop_pad, f_pad, cos_seg, sin_seg, mel_pad


def _kernel(blk_ref, cos_ref, sin_ref, mel_ref, out_ref, *,
            n_seg: int, ref_db: float, amin: float, precision):
    # precision=HIGHEST: the MXU multiplies in bf16 by default; the DFT is
    # part of the bit-compat contract with the XLA reference path, so force
    # the multi-pass f32 formulation (bf16x3, ~3× flops) on the packing
    # path. Training can use the single-pass "fast" mode (~0.02 dB noise on
    # an input that is normalized right after — irrelevant to learning).
    re = jnp.zeros((_FRAME_BLOCK, cos_ref.shape[-1]), jnp.float32)
    im = jnp.zeros((_FRAME_BLOCK, cos_ref.shape[-1]), jnp.float32)
    for j in range(n_seg):
        # shifted view sliced in VMEM (static offset; Mosaic emits a cheap
        # sublane roll for the off-tile starts)
        seg = blk_ref[0, 0, j : j + _FRAME_BLOCK]            # [F, hop_pad]
        re += jnp.dot(seg, cos_ref[j], preferred_element_type=jnp.float32,
                      precision=precision)
        im += jnp.dot(seg, sin_ref[j], preferred_element_type=jnp.float32,
                      precision=precision)

    power = re * re + im * im                                # [F, f_pad]
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=precision)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, mel)) - ref_db
    out_ref[0] = log_spec


@functools.partial(jax.jit,
                   static_argnames=("cfg", "interpret", "precision"))
def logmel_pallas(
    waveform: jnp.ndarray, cfg: Config = DEFAULT, interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Fused log-mel: ``[B, clip_samples] f32 → [B, frames_num, mel] f32``.

    Same semantics as :func:`ops.stft.logmel`, including per-clip
    ``log_top_db`` clamping (``max(log_spec, peak − top_db)``, librosa
    ``power_to_db``) — the cross-block per-clip peak is a tiny XLA
    reduction over the kernel's ``[B, T, mel]`` output, so it stays
    outside the kernel.
    """
    assert waveform.ndim == 2, "expected [batch, samples]"

    n_seg, hop_pad, f_pad, cos_seg, sin_seg, mel_pad = _plan(cfg)
    hop, win = cfg.hop_size, cfg.window_size
    bsz, samples = waveform.shape
    n_frames = 1 + samples // hop
    n_blocks = pl.cdiv(n_frames, _FRAME_BLOCK)
    n_out = n_blocks * _FRAME_BLOCK

    # Centre pad (librosa center=True), then zero-pad so every chunk row of
    # every (overlapping) block exists.
    rows_blk = _round_up(_FRAME_BLOCK + n_seg, 8)            # sublane-tiled
    pad = win // 2
    x = jnp.pad(waveform.astype(jnp.float32), ((0, 0), (pad, pad)),
                mode=cfg.pad_mode)
    n_rows = n_out + rows_blk
    x = jnp.pad(x, ((0, 0), (0, n_rows * hop - x.shape[-1])))
    chunks = jnp.pad(                                        # lane-pad rows
        x.reshape(bsz, n_rows, hop), ((0, 0), (0, 0), (0, hop_pad - hop))
    )
    # Windowed blocks: block t covers chunk rows [t*FB, t*FB + FB + n_seg)
    # (frame f = rows f..f+n_seg-1). ~3% row overlap, built by one fused
    # slice+stack — vs the round-1 n_seg× HBM lag stack (see module doc).
    blocks = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(chunks, t * _FRAME_BLOCK, rows_blk,
                                      axis=1) for t in range(n_blocks)],
        axis=1)                                  # [B, n_blocks, rows_blk, hop_pad]

    ref_db = float(10.0 * np.log10(max(cfg.log_amin, cfg.log_ref)))
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(
        _kernel, n_seg=n_seg, ref_db=ref_db, amin=cfg.log_amin,
        precision=prec
    )

    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blocks),
        in_specs=[
            pl.BlockSpec(                                    # windowed chunks
                (1, 1, rows_blk, hop_pad),
                lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(                                    # resident consts
                (n_seg, hop_pad, f_pad), lambda b, t: (0, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_seg, hop_pad, f_pad), lambda b, t: (0, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (f_pad, cfg.mel_bins), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _FRAME_BLOCK, cfg.mel_bins), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, n_out, cfg.mel_bins), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_out * (2 * win + cfg.mel_bins) * f_pad,
            bytes_accessed=bsz * (n_blocks * rows_blk * hop_pad
                                  + n_out * cfg.mel_bins) * 4,
            transcendentals=bsz * n_out * cfg.mel_bins,
        ),
        interpret=interpret,
    )(blocks, jnp.asarray(cos_seg), jnp.asarray(sin_seg), jnp.asarray(mel_pad))

    out = out[:, :n_frames, :]
    if cfg.log_top_db is not None:
        peak = jnp.max(out, axis=(-2, -1), keepdims=True)    # per clip
        out = jnp.maximum(out, peak - cfg.log_top_db)
    return out
