"""Fused Pallas TPU kernel: waveform → log-mel in one HBM round-trip.

TPU-native replacement for the reference's librosa frontend hot loop
(reference: ``utils/features.py:LogMelExtractor.transform`` +
``calculate_feature_for_all_audio_files``; SURVEY.md §3.1 HOT LOOP #1).
The XLA reference path (``ops/stft.py``) materialises the overlapping frame
matrix ``[B, T, window]`` (an 8× blow-up of the waveform) and the 513-bin
power spectrogram in HBM; this kernel keeps both in VMEM.

Formulation (GEMM-native NDFT, cf. PAPERS.md "MelT"):

* The centre-padded waveform is reshaped into non-overlapping *hop chunks*
  ``[n_rows, hop]`` — one relayout pass, no gather. Frame ``f`` (start
  sample ``f*hop``) is exactly chunks ``f .. f+n_seg-1`` where
  ``n_seg = ceil(window / hop)`` (partial last segment zero-padded).
* The windowed real-DFT basis is split into ``n_seg`` segment matrices with
  the Hann window folded in, cos and sin CONCATENATED on the column axis
  (one matmul instead of two — saves the lane-padding of two separate
  513-column results, ~10% of the kernel's MXU work), so for a block of
  ``F`` frames::

      [Re | Im] = Σ_j  chunks[f0+j : f0+j+F, :] @ [Wcos_j | Wsin_j]
      logmel    = log10-compress( (Re² + Im²) @ melW )

* The whole clip's chunk rows ride one BlockSpec block whose index map is
  constant in the frame-block coordinate ``t`` — Pallas fetches it once
  per clip and re-uses it across the inner ``t`` steps, so each waveform
  byte is shipped to VMEM once and NOTHING else is staged in HBM. (Round 1
  materialised an 805 MB lag stack; round 2a a windowed-chunk copy plus a
  lane-padded block stack — the device trace showed those costing more
  than the kernel itself: ~2.2 ms/step of pad/relayout/stack fusions
  against the kernel's 2.9 ms.)

Frequency columns are zero-padded to a multiple of the 128-lane tile and
trimmed to the bins the mel filterbank actually reads (fmax < Nyquist drops
a full tile); the hop axis rides unpadded (Mosaic masks the partial minor
tile on loads).
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

__all__ = ["logmel_pallas", "logmel_pallas_bank", "prepare_chunks",
           "unstage_chunks"]

_MAX_FRAME_BLOCK = 512   # frames per grid step: biggest matmul M that
                         # still double-buffers comfortably in VMEM
                         # (measured best of 128/256/512 on v5e)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _geometry(cfg: Config, samples: int):
    """Static frame/chunk geometry for a clip of ``samples`` samples:
    ``(n_frames, frame_block, n_blocks, n_out, n_rows)``."""
    hop, win = cfg.hop_size, cfg.window_size
    n_seg = math.ceil(win / hop)
    n_frames = 1 + samples // hop
    frame_block = min(_MAX_FRAME_BLOCK, _round_up(n_frames, 128))
    n_blocks = pl.cdiv(n_frames, frame_block)
    n_out = n_blocks * frame_block
    # Chunk rows must exist for every (padded) frame: the last block's
    # 8-aligned superset window reads rows
    # (n_blocks-1)*FB .. +roundup(FB+n_seg-1, 8)-1 ...
    n_rows = (n_blocks - 1) * frame_block + _round_up(
        frame_block + n_seg - 1, 8)
    # ... and must also cover the whole centre-padded signal (for configs
    # where samples % hop exceeds the superset window's slack, the formula
    # above can land one row short and the zero-pad would go negative).
    pad = win // 2
    n_rows = max(n_rows, -(-(samples + 2 * pad) // hop))
    return n_frames, frame_block, n_blocks, n_out, n_rows


def prepare_chunks(waveform, cfg: Config = DEFAULT):
    """Stage ``[B, samples] → [B, n_rows, hop]`` hop-chunk rows for
    :func:`logmel_pallas` — centre pad (librosa ``center=True``), zero-pad
    the tail, relayout into non-overlapping hop rows.

    This is exactly the staging :func:`logmel_pallas` performs internally
    for 2-D input, exposed so a corpus that is staged ONCE (the
    device-resident cache, ``main.py``) or a fixed bench batch can pay the
    pad+relayout pass once instead of every step (measured 1.3 ms/step at
    the bench config, batch 128 — the relayout cannot fuse into the kernel
    because Mosaic has no non-128 shape cast; re-tested round 5).

    Works on numpy or jax arrays (pure pad/reshape — bit-exact either
    way) and preserves integer dtypes, so a quantized int16 corpus can be
    staged chunked and decoded on device by the train step's
    ``wave_scale`` path.
    """
    xp = np if isinstance(waveform, np.ndarray) else jnp
    hop, win = cfg.hop_size, cfg.window_size
    bsz, samples = waveform.shape
    *_, n_rows = _geometry(cfg, samples)
    pad = win // 2
    x = xp.pad(waveform, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    x = xp.pad(x, ((0, 0), (0, n_rows * hop - x.shape[-1])))
    return x.reshape(bsz, n_rows, hop)


def unstage_chunks(chunks, cfg: Config = DEFAULT):
    """Inverse of :func:`prepare_chunks` for a ``cfg.clip_samples`` clip:
    recover the raw ``[B, samples]`` waveform from staged hop-chunk rows
    (the interior of the centre-padded signal — reflect padding copies
    interior samples, so the slice is exact).

    Used by the XLA frontend fallback (``ops/stft.make_logmel_fn``) so a
    corpus staged chunked for the Pallas fast path still evaluates
    bit-identically on CPU/interpret backends that take 2-D waveforms.
    """
    hop, win = cfg.hop_size, cfg.window_size
    samples = cfg.clip_samples
    *_, n_rows = _geometry(cfg, samples)
    if chunks.shape[1:] != (n_rows, hop):
        raise ValueError(
            f"chunk rows must be [B, {n_rows}, {hop}] for "
            f"clip_samples={samples} (got {chunks.shape})")
    pad = win // 2
    flat = chunks.reshape(chunks.shape[0], n_rows * hop)
    return flat[:, pad : pad + samples]


@functools.lru_cache(maxsize=4)
def _plan(cfg: Config):
    """Host-side constant folding: concatenated [cos|sin] segment basis +
    padded mel matrix."""
    hop, win = cfg.hop_size, cfg.window_size
    # chunk rows ride with an UNPADDED minor dim: Mosaic masks the
    # partial 128-lane tile on load, and the measured kernel time is
    # identical to a lane-padded layout — while skipping the padded
    # copy saves a full pass over the staged chunks (device trace:
    # pad fusion 0.62 ms/step at bench shapes)
    hop_pad = hop
    n_seg = math.ceil(win / hop)
    n_freq = win // 2 + 1

    mel = dsp.mel_filterbank(
        cfg.sample_rate, win, cfg.mel_bins, cfg.fmin, cfg.fmax, dtype=np.float32
    )                                                        # [n_freq, mel]
    # Spectrum bins whose mel weights are all zero (above fmax / below
    # fmin) cannot contribute to the output — drop them from the DFT basis
    # entirely. At the DCASE config (fmax=14 kHz of a 16 kHz Nyquist) this
    # trims 513 → ~450 bins, i.e. one full 128-lane tile of MXU work.
    nz = np.nonzero(mel.any(axis=1))[0]
    n_used = int(nz[-1]) + 1 if nz.size else n_freq
    f_half = _round_up(n_used, 128)          # Re / Im column block

    cos_m, sin_m = dsp.dft_matrices(win, dtype=np.float32)   # [win, n_freq]
    basis = np.zeros((n_seg, hop_pad, 2 * f_half), np.float32)
    for j in range(n_seg):
        lo, hi = j * hop, min((j + 1) * hop, win)
        basis[j, : hi - lo, :n_used] = cos_m[lo:hi, :n_used]
        basis[j, : hi - lo, f_half : f_half + n_used] = sin_m[lo:hi, :n_used]

    mel_pad = np.zeros((f_half, cfg.mel_bins), np.float32)
    mel_pad[:n_used] = mel[:n_used]
    return n_seg, hop_pad, f_half, basis, mel_pad


def _kernel(blk_ref, basis_ref, mel_ref, out_ref, *, frame_block: int,
            n_seg: int, f_half: int, ref_db: float, amin: float, precision):
    # precision=HIGHEST: the MXU multiplies in bf16 by default; the DFT is
    # part of the bit-compat contract with the XLA reference path, so force
    # the multi-pass f32 formulation (bf16x3, ~3× flops) on the packing
    # path. Training can use the single-pass "fast" mode (~0.02 dB noise on
    # an input that is normalized right after — irrelevant to learning).
    t = pl.program_id(1)
    # frame f needs chunk rows f..f+n_seg-1; the whole clip's rows are
    # resident, so fetch the block's row window once (8-aligned dynamic
    # start — Mosaic requires provable sublane alignment) and slice the
    # n_seg shifted views statically (cheap sublane rolls).
    sup_rows = _round_up(frame_block + n_seg - 1, 8)
    # astype is a no-op for the f32 paths; the bank-gather path ships
    # int16 chunk rows and decodes HERE (VPU convert of VMEM-resident
    # data) — the PCM scale is folded into the basis, not applied to the
    # samples (see logmel_pallas_bank)
    sup = blk_ref[0, pl.ds(t * frame_block, sup_rows), :].astype(jnp.float32)
    acc = jnp.zeros((frame_block, 2 * f_half), jnp.float32)
    for j in range(n_seg):
        seg = sup[j : j + frame_block]
        acc += jnp.dot(seg, basis_ref[j], preferred_element_type=jnp.float32,
                       precision=precision)

    re = acc[:, :f_half]
    im = acc[:, f_half:]
    power = re * re + im * im                                # [F, f_half]
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

    3-D input ``[B, n_rows, hop]`` is taken as PRE-STAGED hop-chunk rows
    from :func:`prepare_chunks` for a ``cfg.clip_samples`` clip — the
    internal pad+relayout pass is skipped (the device-cache /
    fixed-corpus fast path).
    """
    n_seg, hop_pad, f_half, basis, mel_pad = _plan(cfg)
    hop, win = cfg.hop_size, cfg.window_size

    if waveform.ndim == 3:                       # pre-staged chunk rows
        bsz = waveform.shape[0]
        samples = cfg.clip_samples
        n_frames, frame_block, n_blocks, n_out, n_rows = _geometry(
            cfg, samples)
        if waveform.shape[1:] != (n_rows, hop):
            raise ValueError(
                f"pre-chunked input must be [B, {n_rows}, {hop}] for "
                f"clip_samples={samples} (got {waveform.shape}) — stage "
                "it with prepare_chunks()")
        chunks = waveform.astype(jnp.float32)
    else:
        assert waveform.ndim == 2, "expected [batch, samples] or chunks"
        bsz, samples = waveform.shape
        n_frames, frame_block, n_blocks, n_out, n_rows = _geometry(
            cfg, samples)
        chunks = prepare_chunks(waveform.astype(jnp.float32), cfg)

    ref_db = float(10.0 * np.log10(max(cfg.log_amin, cfg.log_ref)))
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(
        _kernel, frame_block=frame_block, n_seg=n_seg, f_half=f_half,
        ref_db=ref_db, amin=cfg.log_amin, precision=prec
    )

    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blocks),
        in_specs=[
            # whole-clip chunk rows; constant in t → fetched once per clip
            pl.BlockSpec(
                (1, n_rows, hop_pad),
                lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(                                    # resident consts
                (n_seg, hop_pad, 2 * f_half), lambda b, t: (0, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (f_half, cfg.mel_bins), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, frame_block, cfg.mel_bins), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, n_out, cfg.mel_bins), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_out * (n_seg * hop * 2 * f_half
                                     + f_half * cfg.mel_bins),
            bytes_accessed=bsz * (n_rows * hop_pad
                                  + n_out * cfg.mel_bins) * 4,
            transcendentals=bsz * n_out * cfg.mel_bins,
        ),
        interpret=interpret,
    )(chunks, jnp.asarray(basis), jnp.asarray(mel_pad))

    out = out[:, :n_frames, :]
    if cfg.log_top_db is not None:
        peak = jnp.max(out, axis=(-2, -1), keepdims=True)    # per clip
        out = jnp.maximum(out, peak - cfg.log_top_db)
    return out


@functools.partial(
    jax.jit, static_argnames=("cfg", "wave_scale", "interpret", "precision"))
def logmel_pallas_bank(
    bank: jnp.ndarray, idx: jnp.ndarray, cfg: Config = DEFAULT,
    wave_scale: float | None = None, interpret: bool = False,
    precision: str = "fast",
) -> jnp.ndarray:
    """Log-mel straight out of a device-resident corpus bank:
    ``bank [N, n_rows, hop] (+ idx [B] int32) → [B, frames_num, mel] f32``.

    The gather happens INSIDE the kernel grid: the bank block's index map
    reads the clip coordinate from a scalar-prefetched index vector
    (``pltpu.PrefetchScalarGridSpec``), so the batch's rows go HBM→VMEM
    directly — no materialized ``jnp.take`` batch, no decoded f32 copy.
    vs the gather-then-kernel formulation at bench shapes (batch 128)
    this removes ~410 MB/step of HBM traffic: the gather's int16 read
    (82 MB) + decoded f32 write (164 MB) + the kernel's f32 re-read
    (164 MB) collapse into one 82 MB int16 read.

    ``wave_scale`` decodes quantized int16 banks (``data/hdf5``): it is
    folded into the DFT basis — bit-exact vs decode-then-transform
    because the PCM scale (2^-15) is a power of two, so both the basis
    scaling and each product ``q·(b·s) == (q·s)·b`` are pure exponent
    shifts with identical rounding. The int16→f32 convert itself runs
    on the VPU inside the kernel. Required for integer banks; must be a
    power of two (asserted) — which ``_WAVE_INT16_SCALE`` is.

    Output is bit-identical to
    ``logmel_pallas(prepare_chunks(decoded)[idx], cfg)`` (tested).
    """
    n_seg, hop_pad, f_half, basis, mel_pad = _plan(cfg)
    hop = cfg.hop_size
    samples = cfg.clip_samples
    n_frames, frame_block, n_blocks, n_out, n_rows = _geometry(cfg, samples)
    if bank.ndim != 3 or bank.shape[1:] != (n_rows, hop):
        raise ValueError(
            f"bank must be [N, {n_rows}, {hop}] chunk rows for "
            f"clip_samples={samples} (got {bank.shape}) — stage it with "
            "prepare_chunks()")
    if jnp.issubdtype(bank.dtype, jnp.integer):
        if wave_scale is None:
            raise ValueError("integer bank needs wave_scale to decode")
        frac, _ = math.frexp(wave_scale)
        if frac != 0.5:
            raise ValueError(
                f"wave_scale must be a power of two to fold into the "
                f"basis bit-exactly (got {wave_scale})")
        basis = basis * np.float32(wave_scale)
    bsz = idx.shape[0]

    ref_db = float(10.0 * np.log10(max(cfg.log_amin, cfg.log_ref)))
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(
        _kernel, frame_block=frame_block, n_seg=n_seg, f_half=f_half,
        ref_db=ref_db, amin=cfg.log_amin, precision=prec
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                   # idx rides ahead in SMEM
        grid=(bsz, n_blocks),
        in_specs=[
            # the clip's chunk rows, fetched straight from the bank row
            # the prefetched index names; constant in t → once per clip
            pl.BlockSpec(
                (1, n_rows, hop_pad),
                lambda b, t, idx_ref: (idx_ref[b], 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(                                    # resident consts
                (n_seg, hop_pad, 2 * f_half), lambda b, t, idx_ref: (0, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (f_half, cfg.mel_bins), lambda b, t, idx_ref: (0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, frame_block, cfg.mel_bins), lambda b, t, idx_ref: (b, t, 0),
            memory_space=pltpu.VMEM),
    )

    def kernel_with_idx(idx_ref, blk_ref, basis_ref, mel_ref, out_ref):
        kernel(blk_ref, basis_ref, mel_ref, out_ref)

    out = pl.pallas_call(
        kernel_with_idx,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bsz, n_out, cfg.mel_bins), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_out * (n_seg * hop * 2 * f_half
                                     + f_half * cfg.mel_bins),
            bytes_accessed=bsz * (n_rows * hop_pad * bank.dtype.itemsize
                                  + n_out * cfg.mel_bins * 4),
            transcendentals=bsz * n_out * cfg.mel_bins,
        ),
        interpret=interpret,
    )(idx.astype(jnp.int32), bank, jnp.asarray(basis), jnp.asarray(mel_pad))

    out = out[:, :n_frames, :]
    if cfg.log_top_db is not None:
        peak = jnp.max(out, axis=(-2, -1), keepdims=True)    # per clip
        out = jnp.maximum(out, peak - cfg.log_top_db)
    return out
