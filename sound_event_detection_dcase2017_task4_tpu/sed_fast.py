"""Corpus-scale SED decode + segment scoring on device (threshold search).

The reference's ``optimize_sed_thresholds`` re-runs the full host decode +
``sed_eval`` scoring per candidate (SURVEY.md §3.5 "slow outer loop"); our
round-2 equivalent did the same with the numpy ``sed.binarize`` path —
~25k Python run-length scans per score evaluation at the real testing
split's size (488 clips × 1001 frames × 17 classes), i.e. hours for the
~1.4k evaluations of the full ``sed_params_dict`` search.

This module moves the entire score evaluation on device:

* :func:`binarize_dynamic` — same decode semantics as ``sed.binarize``
  (hysteresis → gap fill → de-salt) but with the smoothing lengths as
  *traced* scalars. Morphology with a dynamic structuring-element length
  can't use ``reduce_window`` (static window shapes); instead run/gap
  lengths are computed in closed form from running extrema
  (``runlen_fwd(x)[i] = i - cummax(where(x, -1, index))[i]``) and a run
  contains a seed iff ``cummax(seed index) >= run start`` (or the reverse
  ``cummin(seed index) <= run end``) — dense cum-op work, no ``lax.scan``
  (measured 100 ms/eval as a sequential scan at 488×1001×17), no gathers
  (~10× slower than cum-ops on TPU), and one XLA compilation covering
  every ``(n_smooth, n_salt)`` the search tries, in a time-minor layout
  that fills the TPU vector lanes (see ``_binarize_time_minor``).
* :class:`DeviceSegmentScorer` — 1 s segment activity is a max-pool over
  ``frames_per_second`` frames of the binarized activity; Ntp/Nfp/Nfn are
  integer reductions against a precomputed ground-truth segment tensor.
  The jitted program returns the raw integer counts and the host does the
  float64 F1 division, so scores are BIT-IDENTICAL to the numpy
  ``sed.binarize`` → ``scoring.segment_based_metrics`` path (same integer
  counts, same float64 arithmetic) and the search trajectory cannot
  diverge between backends. ``tests/test_sed_fast.py`` pins both.

Files present in the ground truth but absent from the predictions keep
sed_eval's union-of-files semantics: their segments are pure deletions,
a constant added to the Nfn term (`scoring.segment_based_metrics`
union handling; round-1 finding).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import numpy as np

from . import scoring
from .config import (frames_per_second as _fps_default,
                     labels as _default_labels)

__all__ = ["binarize_dynamic", "DeviceSegmentScorer"]


def _binarize_time_minor(probs, high, low, n_smooth, n_salt):
    """Decode core on arrays whose LAST axis is time.

    The minor (lane) axis of a TPU vector register holds 128 elements: with
    the natural ``[N, T, C=17]`` layout every op runs at 17/128 lane fill,
    a measured ~3× eval-time penalty; time-minor ``[N, C, T=1001]`` fills
    the lanes. All the work is cummax/cummin + elementwise — no lax.scan
    (a sequential scan pays ~T dispatch steps: measured 100 ms/eval at
    488×1001×17), no custom associative_scan (compiled pathologically on
    this backend), no gathers (measured ~10× slower than cum-ops here).
    """
    import jax
    import jax.numpy as jnp

    seeds = probs >= high
    act = probs >= low

    t = act.shape[-1]
    ax = act.ndim - 1                             # XLA cum-ops reject -1
    pos = jnp.arange(t, dtype=jnp.int32)          # broadcasts on last axis

    def runlen_fwd(x):
        """Length of the consecutive True-run ending at i (0 where False):
        i - (last index ≤ i where x is False), via a running max."""
        z = jnp.where(x, jnp.int32(-1), pos)
        return pos - jax.lax.cummax(z, axis=ax)

    def runlen_bwd(x):
        """Mirror: length of the run starting at i."""
        z = jnp.where(x, jnp.int32(t), pos)
        return jax.lax.cummin(z, axis=ax, reverse=True) - pos

    # hysteresis: keep a low-threshold run iff it contains a seed. A seed
    # lies in [run_start, i] iff the running max of seed indices reaches
    # run_start (a seed of an EARLIER run is separated by ≥1 inactive
    # frame, so its index is < run_start); mirror with a reverse running
    # min for [i, run_end].
    af, ab = runlen_fwd(act), runlen_bwd(act)
    start = pos - af + 1                          # run start (active pos)
    end = pos + ab - 1                            # run end   (active pos)
    is_seed = act & seeds
    last_seed = jax.lax.cummax(jnp.where(is_seed, pos, jnp.int32(-1)),
                               axis=ax)
    next_seed = jax.lax.cummin(jnp.where(is_seed, pos, jnp.int32(t)),
                               axis=ax, reverse=True)
    kept = act & ((last_seed >= start) | (next_seed <= end))

    # gap fill: an inactive position belongs to a zero-run of length
    # gf+gb-1 spanning [pos-gf+1, pos+gb-1]; fill iff the run is enclosed
    # by activity on both sides and strictly shorter than n_smooth
    inact = ~kept
    gf = runlen_fwd(inact)
    gb = runlen_bwd(inact)
    gap_len = gf + gb - 1
    enclosed = ((pos - gf + 1) > 0) & ((pos + gb - 1) < t - 1)
    kept = kept | (inact & enclosed & (gap_len < n_smooth))

    # de-salt: drop active runs strictly shorter than n_salt
    sf = runlen_fwd(kept)
    sb = runlen_bwd(kept)
    return kept & ((sf + sb - 1) >= n_salt)


def binarize_dynamic(framewise, high_threshold, low_threshold,
                     n_smooth, n_salt):
    """``sed.binarize`` twin with traced smoothing lengths. ``[N, T, C]``.

    Semantics (verified against the numpy oracle in
    ``tests/test_sed_fast.py``): hysteresis keeps low-threshold runs
    containing a high-threshold seed; gaps strictly shorter than
    ``n_smooth`` frames are filled only when enclosed by activity
    (leading/trailing gaps stay open); active runs strictly shorter than
    ``n_salt`` are dropped. ``n_smooth``/``n_salt`` may be Python ints or
    traced int scalars — unlike ``sed.binarize_jax`` they do NOT trigger
    recompilation when they change.

    The compute core is time-minor (see :func:`_binarize_time_minor`);
    this wrapper transposes in/out to keep the public ``[N, T, C]``
    contract of ``sed.binarize``.
    """
    import jax.numpy as jnp

    probs = jnp.swapaxes(jnp.asarray(framewise), 1, 2)       # [N, C, T]
    high = jnp.asarray(high_threshold, jnp.float32)
    low = jnp.asarray(low_threshold, jnp.float32)
    if high.ndim == 1:                            # per-class [C] → [C, 1]
        high = high[:, None]
    if low.ndim == 1:
        low = low[:, None]
    kept = _binarize_time_minor(probs, high, low, n_smooth, n_salt)
    return jnp.swapaxes(kept, 1, 2).astype(jnp.uint8)


class DeviceSegmentScorer:
    """Segment-F1 of a fixed prediction set as a jitted function of the
    decode params — the inner loop of ``optimize_sed_thresholds``.

    One instance precomputes the ground-truth segment tensor for
    ``audio_names`` (plus the constant deletion count of ground-truth-only
    files); :meth:`score_params` then evaluates a full ``sed_params_dict``
    in one device round trip.
    """

    def __init__(self, framewise: np.ndarray, audio_names: Sequence[str],
                 ground_truth: Dict[str, List[tuple]],
                 labels: Sequence[str] = _default_labels,
                 frames_per_second: int = _fps_default,
                 time_resolution: float = 1.0,
                 clip_duration: float = 10.0):
        import jax
        import jax.numpy as jnp

        framewise = np.asarray(framewise, np.float32)
        n, t, c = framewise.shape
        assert c == len(labels), (c, len(labels))
        self._classes = c
        seg_frames = int(round(time_resolution * frames_per_second))
        # frames cover t/fps seconds; the last (possibly partial) segment
        # matches the numpy path, where a run ending at frame T yields an
        # event offset T/fps whose ceil() opens segment ceil(T/fps) — and
        # ref events may extend to clip_duration
        n_seg = max(math.ceil(t / seg_frames),
                    math.ceil(clip_duration / time_resolution))
        # the numpy path grows per-file segment counts to cover ref events
        # past the clip duration — match, or their segments would be
        # clamped away and Nfn undercounted
        for name in audio_names:
            for _, offset, _ in ground_truth.get(name, []):
                n_seg = max(n_seg, math.ceil(offset / time_resolution))
        label_index = {lb: i for i, lb in enumerate(labels)}

        ref = np.zeros((n, n_seg, c), bool)
        for i, name in enumerate(audio_names):
            ref[i] = scoring.segment_activity(
                ground_truth.get(name, []), n_seg, time_resolution,
                label_index)

        # union-of-files semantics: ground-truth files with no predictions
        # are scored as pure deletions — a constant Nfn contribution
        # (tracked per class: the grid-ascent fast path recombines
        # per-class counts on the host)
        known = set(audio_names)
        extra_fn_c = np.zeros(c, np.int64)
        for fname, events in ground_truth.items():
            if fname in known:
                continue
            ends = [clip_duration] + [e[1] for e in events]
            ns = max(1, math.ceil(max(ends) / time_resolution))
            extra_fn_c += scoring.segment_activity(
                events, ns, time_resolution, label_index).sum(axis=0)
        self._extra_fn_per_class = extra_fn_c
        self._extra_fn = int(extra_fn_c.sum())

        # the big tensors are ARGUMENTS of the jitted program, not
        # closed-over values: captured device arrays embed as HLO
        # constants (a 33 MB framewise tensor produced a 58 MB executable
        # and minutes of compile); as arguments they stay device-resident
        # between calls and the compiled program is a few KB. Layout is
        # time-minor [N, C, T] for full TPU lane fill (see
        # _binarize_time_minor) — transposed ONCE here, never per eval.
        self._ref_dev = jnp.asarray(np.swapaxes(ref, 1, 2))   # [N, C, S]
        self._fw_dev = jnp.asarray(np.swapaxes(framewise, 1, 2))
        pad_t = n_seg * seg_frames - t

        def est_segments(fw, high, low, n_smooth, n_salt):
            kept = _binarize_time_minor(fw, high[:, None], low[:, None],
                                        n_smooth, n_salt)
            a = jnp.pad(kept, ((0, 0), (0, 0), (0, pad_t)))
            return jax.lax.reduce_window(
                a, False, jax.lax.bitwise_or,
                window_dimensions=(1, 1, seg_frames),
                window_strides=(1, 1, seg_frames),
                padding="VALID")                       # [N, C, n_seg]

        def counts(fw, ref_seg, high, low, n_smooth, n_salt):
            est = est_segments(fw, high, low, n_smooth, n_salt)
            tp = jnp.sum(est & ref_seg, dtype=jnp.int32)
            fp = jnp.sum(est & ~ref_seg, dtype=jnp.int32)
            fn = jnp.sum(ref_seg & ~est, dtype=jnp.int32)
            # ONE stacked result = one host round trip (three scalars cost
            # three tunnel transfers)
            return jnp.stack([tp, fp, fn])

        def counts_per_class(fw, ref_seg, high, low, n_smooth, n_salt):
            est = est_segments(fw, high, low, n_smooth, n_salt)
            tp = jnp.sum(est & ref_seg, axis=(0, 2), dtype=jnp.int32)
            fp = jnp.sum(est & ~ref_seg, axis=(0, 2), dtype=jnp.int32)
            fn = jnp.sum(ref_seg & ~est, axis=(0, 2), dtype=jnp.int32)
            return jnp.stack([tp, fp, fn])             # [3, C]

        self._counts = jax.jit(counts)
        self._counts_pc = jax.jit(counts_per_class)

    def segment_counts(self, high, low, n_smooth: int, n_salt: int):
        """Exact integer (Ntp, Nfp, Nfn) for the given decode params —
        Nfn includes the ground-truth-only-file constant."""
        import jax.numpy as jnp

        c = self._classes
        high = np.broadcast_to(np.asarray(high, np.float32), (c,))
        low = np.broadcast_to(np.asarray(low, np.float32), (c,))
        out = np.asarray(self._counts(
            self._fw_dev, self._ref_dev, jnp.asarray(high),
            jnp.asarray(low), jnp.int32(n_smooth), jnp.int32(n_salt)))
        tp, fp, fn = (int(v) for v in out)
        return tp, fp, fn + self._extra_fn

    def per_class_counts(self, high, low, n_smooth: int, n_salt: int):
        """Exact integer ``[3, C]`` (tp, fp, fn) PER CLASS, fn including
        each class's ground-truth-only-file constant. One device round
        trip evaluates a candidate threshold for EVERY class at once —
        class c's counts depend only on (high_c, low_c), which is what
        makes the grid-ascent fast path (autoth) possible."""
        import jax.numpy as jnp

        c = self._classes
        high = np.broadcast_to(np.asarray(high, np.float32), (c,))
        low = np.broadcast_to(np.asarray(low, np.float32), (c,))
        out = np.asarray(self._counts_pc(
            self._fw_dev, self._ref_dev, jnp.asarray(high),
            jnp.asarray(low), jnp.int32(n_smooth),
            jnp.int32(n_salt))).astype(np.int64)
        out[2] += self._extra_fn_per_class
        return out

    def score_params(self, params: Dict) -> float:
        """Overall segment F1 (the ``optimize_sed_thresholds`` objective);
        float64 host division over exact integer counts — bit-identical to
        ``scoring.segment_based_metrics``'s ``f_measure``."""
        tp, fp, fn = self.segment_counts(
            params["sed_high_threshold"], params["sed_low_threshold"],
            int(params["n_smooth"]), int(params["n_salt"]))
        denom = 2 * tp + fp + fn
        return (2 * tp / denom) if denom else 0.0
