"""On-chip wall-time benchmark of the SED threshold search.

Round-4 verdict item 3: the grid-ascent dispatch batching
(``autoth._ascent_via_counts``) is proven bit-exact on CPU, but its ~7×
dispatch reduction only had a PROJECTED wall time ("~75 s → ~10 s").
This driver measures both paths on the real chip at the production size
(the reference testing split: 488 clips × 1001 frames × 17 classes):

* sequential — ``optimize_sed_params(score_fn=scorer.score_params)``:
  one device dispatch per score evaluation, up to 4·C per ascent sweep
  (the round-3 record: 75.4 s);
* grid-ascent — ``optimize_sed_params(counts_fn=scorer.per_class_counts)``:
  ~9 dispatches per sweep, identical trajectory.

Both paths run the same synthetic-but-structured prediction set and the
same ground truth, and must return the SAME optimum (asserted). Dispatch
counts are measured by wrapping the scorer methods. Prints one JSON line.

Usage::

    python tools/sed_search_bench.py [--clips 488] [--frames 1001]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_inputs(n: int, t: int, c: int, seed: int = 0):
    """Structured predictions + ground truth: per-clip per-class event
    blocks with smooth onset/offset ramps over a noise floor, so the
    search has a real optimum to climb toward (pure noise would make the
    ascent terminate in one or two sweeps and undersell the cost)."""
    rng = np.random.RandomState(seed)
    fps = 100
    fw = rng.rand(n, t, c).astype(np.float32) * 0.25
    gt = {}
    names = [f"clip{i:05d}.wav" for i in range(n)]
    for i in range(n):
        events = []
        for _ in range(rng.randint(1, 4)):
            k = rng.randint(c)
            f0 = rng.randint(0, max(1, t - 120))
            dur = rng.randint(40, 240)
            f1 = min(t, f0 + dur)
            fw[i, f0:f1, k] += 0.3 + 0.5 * rng.rand()
            # the model "detects" with jittered boundaries
            events.append((f0 / fps, f1 / fps, f"class{k}"))
        gt[names[i]] = events
    np.clip(fw, 0.0, 1.0, out=fw)
    return fw, names, gt


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clips", type=int, default=488)
    p.add_argument("--frames", type=int, default=1001)
    p.add_argument("--classes", type=int, default=17)
    p.add_argument("--skip_sequential", action="store_true",
                   help="only time the grid-ascent path")
    args = p.parse_args(argv)

    from sound_event_detection_dcase2017_task4_tpu import autoth
    from sound_event_detection_dcase2017_task4_tpu.runtime import (
        enable_compile_cache)

    enable_compile_cache()

    from sound_event_detection_dcase2017_task4_tpu.sed_fast import (
        DeviceSegmentScorer)

    import jax

    labels = [f"class{k}" for k in range(args.classes)]
    fw, names, gt = make_inputs(args.clips, args.frames, args.classes)
    print(f"backend={jax.default_backend()} "
          f"size={args.clips}x{args.frames}x{args.classes}",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    scorer = DeviceSegmentScorer(fw, names, gt, labels, 100)
    # force the first compile outside the timed region (both paths share
    # the compiled programs; production pays this once per process)
    scorer.score_params({"sed_high_threshold": 0.5,
                         "sed_low_threshold": 0.25,
                         "n_smooth": 10, "n_salt": 10})
    scorer.per_class_counts(np.full(args.classes, 0.5),
                            np.full(args.classes, 0.25), 10, 10)
    compile_s = time.perf_counter() - t0
    print(f"scorer build+compile {compile_s:.1f}s", file=sys.stderr,
          flush=True)

    calls = {"score": 0, "counts": 0}
    score_inner, counts_inner = scorer.score_params, scorer.per_class_counts

    def counted_score(params):
        calls["score"] += 1
        return score_inner(params)

    def counted_counts(*a, **k):
        calls["counts"] += 1
        return counts_inner(*a, **k)

    t0 = time.perf_counter()
    best_g, params_g = autoth.optimize_sed_params(
        counted_score, args.classes, counts_fn=counted_counts)
    grid_s = time.perf_counter() - t0
    grid_dispatches = calls["score"] + calls["counts"]
    print(f"grid-ascent: {grid_s:.1f}s, {grid_dispatches} dispatches, "
          f"best={best_g:.4f}", file=sys.stderr, flush=True)

    seq_s = seq_dispatches = None
    if not args.skip_sequential:
        calls["score"] = calls["counts"] = 0
        t0 = time.perf_counter()
        best_s, params_s = autoth.optimize_sed_params(
            counted_score, args.classes)
        seq_s = time.perf_counter() - t0
        seq_dispatches = calls["score"]
        print(f"sequential: {seq_s:.1f}s, {seq_dispatches} dispatches, "
              f"best={best_s:.4f}", file=sys.stderr, flush=True)
        # identical trajectory ⇒ identical optimum (test_sed_fast.py pins
        # this on CPU; here it guards the measurement itself)
        assert abs(best_g - best_s) < 1e-12, (best_g, best_s)
        assert params_g["n_smooth"] == params_s["n_smooth"]
        assert params_g["n_salt"] == params_s["n_salt"]
        np.testing.assert_array_equal(params_g["sed_high_threshold"],
                                      params_s["sed_high_threshold"])
        np.testing.assert_array_equal(params_g["sed_low_threshold"],
                                      params_s["sed_low_threshold"])

    print(json.dumps({
        "backend": jax.default_backend(),
        "size": [args.clips, args.frames, args.classes],
        "compile_s": round(compile_s, 1),
        "grid_ascent_s": round(grid_s, 1),
        "grid_ascent_dispatches": grid_dispatches,
        "sequential_s": None if seq_s is None else round(seq_s, 1),
        "sequential_dispatches": seq_dispatches,
        "speedup": (None if seq_s is None else round(seq_s / grid_s, 2)),
        "best_score": round(float(best_g), 6),
    }))


if __name__ == "__main__":
    main()
