"""Frame-level SED post-processing: probabilities → event lists.

Reference surface (SURVEY.md §2 "SED event decoder", §3.3 HOT LOOP #3):
``utils/utilities.py:frame_prediction_to_event_prediction`` with a
``sed_params_dict`` of per-stage knobs — high/low threshold hysteresis,
gap smoothing (``n_smooth``), short-segment removal (``n_salt``) — and
BASELINE.json's description "sigmoid thresholding, median filtering,
event-segment merging".

Pipeline (pure function, exhaustively unit-tested — SURVEY.md §7 hard
parts: order of operations must be stable):

1. hysteresis binarization: a frame is active if it belongs to a connected
   run of ``p >= low`` that contains at least one frame ``p >= high``
   (``high == low`` degenerates to plain thresholding);
2. smoothing: fill inactive gaps shorter than ``n_smooth`` frames
   (event-segment merging);
3. de-salting: drop active runs shorter than ``n_salt`` frames;
4. run-length extraction → ``(onset_s, offset_s, label)`` events at the
   config frame rate.

Steps 1–3 are vectorised numpy over ``[clips, frames, classes]`` (the
heavy part); only the final run extraction walks per clip — on 1.1k eval
clips this is milliseconds, so no Pallas kernel is warranted here. A
jax variant of 1–3 (`binarize_jax`) is provided for fully on-device
decoding inside a jitted eval step.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from .config import frames_per_second as _fps_default, idx_to_lb

__all__ = ["sed_params_dict", "binarize", "binarize_jax",
           "events_from_binary", "frame_prediction_to_event_prediction"]

# Default decode knobs (reference: sed_params_dict keys like
# 'sed_high_threshold', 'sed_low_threshold', 'n_smooth', 'n_salt';
# values reconstructed — re-verify when the reference mount is populated).
sed_params_dict: Dict = {
    "sed_high_threshold": 0.5,
    "sed_low_threshold": 0.2,
    "n_smooth": 10,
    "n_salt": 10,
}


def _fill_gaps(active: np.ndarray, n_smooth: int) -> np.ndarray:
    """Fill 0-gaps strictly shorter than ``n_smooth`` frames. [N, T, C]."""
    if n_smooth <= 1:
        return active
    n, t, c = active.shape
    # pad with active=1 at both ends so leading/trailing gaps are NOT filled
    # (a gap must be enclosed by activity to be merged).
    out = active.copy()
    # positions of transitions per (n, c): work on time axis
    pad = np.zeros((n, 1, c), dtype=np.int8)
    a = np.concatenate([pad, active.astype(np.int8), pad], axis=1)
    d = np.diff(a, axis=1)          # +1 at run starts, -1 after run ends
    for i in range(n):
        for k in range(c):
            starts = np.flatnonzero(d[i, :, k] == 1)
            ends = np.flatnonzero(d[i, :, k] == -1)   # exclusive
            # gaps between consecutive runs: [ends[j], starts[j+1])
            for j in range(len(starts) - 1):
                gap = starts[j + 1] - ends[j]
                if 0 < gap < n_smooth:
                    out[i, ends[j]:starts[j + 1], k] = 1
    return out


def _remove_salt(active: np.ndarray, n_salt: int) -> np.ndarray:
    """Drop active runs strictly shorter than ``n_salt`` frames. [N, T, C]."""
    if n_salt <= 1:
        return active
    n, t, c = active.shape
    out = active.copy()
    pad = np.zeros((n, 1, c), dtype=np.int8)
    a = np.concatenate([pad, active.astype(np.int8), pad], axis=1)
    d = np.diff(a, axis=1)
    for i in range(n):
        for k in range(c):
            starts = np.flatnonzero(d[i, :, k] == 1)
            ends = np.flatnonzero(d[i, :, k] == -1)
            for s, e in zip(starts, ends):
                if e - s < n_salt:
                    out[i, s:e, k] = 0
    return out


def binarize(framewise: np.ndarray,
             high_threshold,
             low_threshold,
             n_smooth: int = 1,
             n_salt: int = 1) -> np.ndarray:
    """Hysteresis + smoothing + de-salting. ``[N, T, C] → uint8 [N, T, C]``.

    Thresholds may be scalars or per-class ``[C]`` arrays (numpy broadcasting
    against ``[N, T, C]``) — per-class arrays feed the autoth optimization.
    """
    probs = np.asarray(framewise)
    high_threshold = np.asarray(high_threshold, np.float32)
    low_threshold = np.asarray(low_threshold, np.float32)
    seeds = probs >= high_threshold
    act = (probs >= low_threshold).astype(np.uint8)

    # hysteresis: keep only low-threshold runs containing a seed.
    # cumulative run ids: id changes when act changes; per (n, c) column.
    n, t, c = act.shape
    changes = np.concatenate(
        [np.ones((n, 1, c), np.uint8), (np.diff(act, axis=1) != 0)], axis=1)
    run_id = np.cumsum(changes, axis=1)            # [N, T, C]
    keep = np.zeros_like(act)
    for i in range(n):
        for k in range(c):
            ids = run_id[i, :, k]
            seeded = np.unique(ids[(seeds[i, :, k]) & (act[i, :, k] == 1)])
            if len(seeded):
                keep[i, :, k] = np.isin(ids, seeded) & act[i, :, k]
    act = keep

    act = _fill_gaps(act, n_smooth)
    act = _remove_salt(act, n_salt)
    return act


def binarize_jax(framewise, high_threshold, low_threshold,
                 n_smooth: int = 1, n_salt: int = 1):
    """On-device decode stages 1–3 (jit-compatible twin of :func:`binarize`).

    Same semantics, expressed as XLA-friendly primitives on ``[N, T, C]``:

    * hysteresis — two associative boolean scans
      (``keep_i = act_i & (seed_i | keep_{i-1})`` forward and backward);
    * gap fill — morphological closing with a flat length-``n_smooth``
      element (max-pool then min-pool, full padding: fills gaps strictly
      shorter than ``n_smooth``, leaves leading/trailing gaps open);
    * de-salt — morphological opening with length ``n_salt`` (min-pool then
      max-pool: drops runs strictly shorter than ``n_salt``).

    Returns a uint8 jax array; verified against the numpy path in
    ``tests/test_sed_decode.py``.
    """
    import jax
    import jax.numpy as jnp

    probs = jnp.asarray(framewise)
    seeds = probs >= jnp.asarray(high_threshold, jnp.float32)
    act = probs >= jnp.asarray(low_threshold, jnp.float32)

    def hyst_scan(a, s, reverse):
        def step(carry, x):
            out = x[0] & (x[1] | carry)
            return out, out

        _, kept = jax.lax.scan(step, jnp.zeros(a.shape[1:], bool),
                               (a, s), reverse=reverse)
        return kept

    a_t = jnp.swapaxes(act, 0, 1)          # scan over time axis
    s_t = jnp.swapaxes(seeds, 0, 1)
    fwd = hyst_scan(a_t, s_t, reverse=False)
    bwd = hyst_scan(a_t, s_t, reverse=True)
    kept = jnp.swapaxes(fwd | bwd, 0, 1).astype(jnp.float32)

    def pool(x, n, reducer, init, pad_value=None):
        # pad_value set → "full" padding (n-1 both sides, length T+n-1);
        # pad_value None → VALID, shrinking length by n-1 back to T.
        if pad_value is not None:
            x = jnp.pad(x, ((0, 0), (n - 1, n - 1), (0, 0)),
                        constant_values=pad_value)
        return jax.lax.reduce_window(
            x, init, reducer, window_dimensions=(1, n, 1),
            window_strides=(1, 1, 1), padding="VALID")

    if n_smooth > 1:                        # closing: dilate(full) → erode
        kept = pool(kept, n_smooth, jax.lax.max, -jnp.inf, pad_value=0.0)
        kept = pool(kept, n_smooth, jax.lax.min, jnp.inf)
    if n_salt > 1:                          # opening: erode(full) → dilate
        kept = pool(kept, n_salt, jax.lax.min, jnp.inf, pad_value=0.0)
        kept = pool(kept, n_salt, jax.lax.max, -jnp.inf)
    return kept.astype(jnp.uint8)


def events_from_binary(active: np.ndarray,
                       frames_per_second: int = _fps_default,
                       labels: Sequence[str] | None = None
                       ) -> List[List[Tuple[float, float, str]]]:
    """Run-length extraction: ``[N, T, C] → per-clip [(onset, offset, label)]``."""
    n, t, c = active.shape
    if labels is None:
        labels = [idx_to_lb[k] for k in range(c)]
    out: List[List[Tuple[float, float, str]]] = []
    pad = np.zeros((n, 1, c), dtype=np.int8)
    a = np.concatenate([pad, active.astype(np.int8), pad], axis=1)
    d = np.diff(a, axis=1)
    for i in range(n):
        events = []
        for k in range(c):
            starts = np.flatnonzero(d[i, :, k] == 1)
            ends = np.flatnonzero(d[i, :, k] == -1)
            for s, e in zip(starts, ends):
                events.append((float(s / frames_per_second),
                               float(e / frames_per_second), labels[k]))
        events.sort()
        out.append(events)
    return out


def frame_prediction_to_event_prediction(
    framewise: np.ndarray,
    params: Dict | None = None,
    frames_per_second: int = _fps_default,
    labels: Sequence[str] | None = None,
) -> List[List[Tuple[float, float, str]]]:
    """Full decode (reference:
    ``utils/utilities.py:frame_prediction_to_event_prediction``)."""
    p = dict(sed_params_dict)
    if params:
        p.update(params)
    active = binarize(
        framewise,
        high_threshold=p["sed_high_threshold"],
        low_threshold=p["sed_low_threshold"],
        n_smooth=p["n_smooth"],
        n_salt=p["n_salt"],
    )
    return events_from_binary(active, frames_per_second, labels)
