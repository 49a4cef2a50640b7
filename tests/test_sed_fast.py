"""Device SED scorer (sed_fast) vs the numpy oracle path.

The threshold search must be free to run on device at corpus scale while
keeping the numpy ``sed.binarize`` → ``scoring.segment_based_metrics``
semantics exactly (round-2 verdict item 2): these tests pin

1. the dynamic-length decode against ``sed.binarize`` under fuzzing,
2. device segment counts against ``segment_based_metrics``'s counts,
3. the full ``optimize_sed_params`` search returning the identical
   optimum through either backend.
"""

import numpy as np
import pytest

from sound_event_detection_dcase2017_task4_tpu import autoth, scoring, sed
from sound_event_detection_dcase2017_task4_tpu.config import labels
from sound_event_detection_dcase2017_task4_tpu.sed_fast import (
    DeviceSegmentScorer, binarize_dynamic)

# CPU-compile-heavy: excluded from the fast tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("seed", range(4))
def test_binarize_dynamic_matches_numpy(seed):
    rng = np.random.RandomState(seed)
    probs = rng.rand(3, 120, 5).astype(np.float32)
    # blocky probabilities so runs/gaps of interesting lengths appear
    probs = np.repeat(probs[:, ::4, :], 4, axis=1)[:, :120, :]
    high = rng.uniform(0.45, 0.7, 5).astype(np.float32)
    low = rng.uniform(0.2, 0.45, 5).astype(np.float32)
    for n_smooth, n_salt in [(1, 1), (3, 1), (1, 4), (5, 3), (10, 10)]:
        want = sed.binarize(probs, high, low, n_smooth, n_salt)
        got = np.asarray(binarize_dynamic(probs, high, low,
                                          n_smooth, n_salt))
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"ns={n_smooth} na={n_salt}")


def test_binarize_dynamic_single_compile():
    """Changing n_smooth/n_salt must NOT recompile — that is the whole
    point of the dynamic formulation (one compile per search)."""
    import jax

    probs = np.random.RandomState(0).rand(2, 50, 3).astype(np.float32)
    fn = jax.jit(binarize_dynamic)
    fn(probs, 0.5, 0.2, np.int32(3), np.int32(2))
    compiles = fn._cache_size()
    fn(probs, 0.6, 0.3, np.int32(7), np.int32(9))
    assert fn._cache_size() == compiles


def _random_eval_setup(seed, n_clips=6, t=101, with_extra_gt=True):
    rng = np.random.RandomState(seed)
    probs = np.repeat(rng.rand(n_clips, (t + 3) // 4, 17).astype(np.float32),
                      4, axis=1)[:, :t, :]
    names = [f"clip_{i}.wav" for i in range(n_clips)]
    gt = {}
    for i in range(n_clips - 1):                  # one clip has no gt events
        events = []
        for _ in range(rng.randint(1, 4)):
            onset = float(rng.uniform(0, 8))
            events.append((onset, onset + float(rng.uniform(0.3, 2.0)),
                           labels[rng.randint(17)]))
        gt[names[i]] = events
    if with_extra_gt:                             # file with no predictions
        gt["missing_from_predictions.wav"] = [(0.5, 2.5, labels[0]),
                                              (4.0, 9.0, labels[3])]
    return probs, names, gt


def _numpy_f1(probs, names, gt, params):
    events = sed.frame_prediction_to_event_prediction(probs, params, 100,
                                                      labels)
    est = {names[i]: events[i] for i in range(len(names))}
    m = scoring.segment_based_metrics(gt, est, 10.0, 1.0, labels)
    return m["overall"]["f_measure"]["f_measure"]


@pytest.mark.parametrize("seed", range(3))
def test_scorer_matches_segment_based_metrics(seed):
    probs, names, gt = _random_eval_setup(seed)
    scorer = DeviceSegmentScorer(probs, names, gt)
    for params in (
        {"sed_high_threshold": 0.5, "sed_low_threshold": 0.2,
         "n_smooth": 10, "n_salt": 10},
        {"sed_high_threshold": np.full(17, 0.6),
         "sed_low_threshold": np.full(17, 0.35),
         "n_smooth": 3, "n_salt": 7},
        {"sed_high_threshold": 0.8, "sed_low_threshold": 0.7,
         "n_smooth": 1, "n_salt": 1},
    ):
        want = _numpy_f1(probs, names, gt, params)
        got = scorer.score_params(params)
        assert got == want, (params, got, want)   # bit-identical, not close


def test_scorer_counts_union_semantics():
    """Ground-truth-only files contribute a constant Nfn (deletions) —
    drop them and the F1 must strictly improve at fixed predictions."""
    probs, names, gt = _random_eval_setup(1, with_extra_gt=True)
    gt_no_extra = {k: v for k, v in gt.items()
                   if k != "missing_from_predictions.wav"}
    params = {"sed_high_threshold": 0.55, "sed_low_threshold": 0.3,
              "n_smooth": 5, "n_salt": 5}
    with_extra = DeviceSegmentScorer(probs, names, gt)
    without = DeviceSegmentScorer(probs, names, gt_no_extra)
    tp1, fp1, fn1 = with_extra.segment_counts(0.55, 0.3, 5, 5)
    tp2, fp2, fn2 = without.segment_counts(0.55, 0.3, 5, 5)
    assert (tp1, fp1) == (tp2, fp2)
    assert fn1 > fn2
    assert with_extra.score_params(params) == _numpy_f1(probs, names, gt,
                                                        params)


def test_ref_events_past_clip_duration_not_clamped():
    """A ref event ending after clip_duration still counts its segments
    (the numpy path grows per-file n_seg; the tensor must too)."""
    probs = np.zeros((1, 101, 17), np.float32)   # no predictions at all
    names = ["a.wav"]
    gt = {"a.wav": [(9.0, 12.5, labels[2])]}     # 4 segments: 9..13
    scorer = DeviceSegmentScorer(probs, names, gt)
    params = {"sed_high_threshold": 0.9, "sed_low_threshold": 0.9,
              "n_smooth": 1, "n_salt": 1}
    tp, fp, fn = scorer.segment_counts(0.9, 0.9, 1, 1)
    assert (tp, fp, fn) == (0, 0, 4)
    assert scorer.score_params(params) == _numpy_f1(probs, names, gt, params)


def test_search_identical_optimum_across_backends():
    """optimize_sed_params through the device scorer must walk the exact
    same trajectory as through the numpy score (scores are bit-identical,
    so every accept/reject decision matches)."""
    probs, names, gt = _random_eval_setup(2, n_clips=4)
    scorer = DeviceSegmentScorer(probs, names, gt)

    def numpy_score(params):
        return _numpy_f1(probs, names, gt, params)

    kwargs = dict(smooth_grid=(1, 5), salt_grid=(1, 5), max_iter=3)
    best_np, params_np = autoth.optimize_sed_params(
        numpy_score, 17, **kwargs)
    best_dev, params_dev = autoth.optimize_sed_params(
        scorer.score_params, 17, **kwargs)
    assert best_dev == best_np
    np.testing.assert_array_equal(params_dev["sed_high_threshold"],
                                  params_np["sed_high_threshold"])
    np.testing.assert_array_equal(params_dev["sed_low_threshold"],
                                  params_np["sed_low_threshold"])
    assert params_dev["n_smooth"] == params_np["n_smooth"]
    assert params_dev["n_salt"] == params_np["n_salt"]


@pytest.mark.parametrize("n_smooth,n_salt", [(0, 0), (1, 1), (200, 1),
                                             (1, 200), (200, 200)])
def test_binarize_dynamic_extreme_lengths(n_smooth, n_salt):
    """Smoothing lengths beyond T (and degenerate 0/1) must keep numpy
    equality — run/gap lengths max out at T, so the comparisons saturate."""
    rng = np.random.RandomState(7)
    probs = np.repeat(rng.rand(2, 30, 3).astype(np.float32), 4,
                      axis=1)[:, :60, :]
    want = sed.binarize(probs, 0.6, 0.3, n_smooth, n_salt)
    got = np.asarray(binarize_dynamic(probs, 0.6, 0.3, n_smooth, n_salt))
    np.testing.assert_array_equal(got, want)


def test_binarize_dynamic_extreme_thresholds():
    rng = np.random.RandomState(8)
    probs = rng.rand(2, 40, 3).astype(np.float32)
    # low=0 → everything active; high=1+ → nothing seeded → all dropped
    all_active = np.asarray(binarize_dynamic(probs, 0.0, 0.0, 1, 1))
    assert all_active.all()
    none = np.asarray(binarize_dynamic(probs, 1.1, 0.3, 1, 1))
    assert not none.any()
    np.testing.assert_array_equal(
        none, sed.binarize(probs, 1.1, 0.3, 1, 1))


class TestGridAscentFastPath:
    """The per-class-counts grid ascent must reproduce the sequential
    HyperParamsOptimizer trajectory EXACTLY (round-4 dispatch-batching:
    ~9 device calls per sweep instead of up to 4C)."""

    def _scorer(self, seed=0, n=10, t=160):
        rng = np.random.RandomState(seed)
        fw = np.repeat(rng.rand(n, t // 8, 17), 8, axis=1).astype(np.float32)
        names = [f"c{i}.wav" for i in range(n)]
        gt = {}
        for i in range(n):
            events = []
            for _ in range(rng.randint(0, 4)):
                on = rng.uniform(0, t / 100 - 0.3)
                events.append((on, on + rng.uniform(0.2, 0.8),
                               labels[rng.randint(17)]))
            gt[names[i]] = events
        gt["missing_extra.wav"] = [(0.1, 0.6, labels[0])]
        return DeviceSegmentScorer(fw, names, gt, labels, 100,
                                   clip_duration=t / 100)

    def test_per_class_counts_sum_to_totals(self):
        sc = self._scorer()
        h = np.linspace(0.3, 0.7, 17)
        low = np.linspace(0.1, 0.3, 17)
        pc = sc.per_class_counts(h, low, 5, 5)
        tp, fp, fn = sc.segment_counts(h, low, 5, 5)
        assert pc.shape == (3, 17)
        assert (int(pc[0].sum()), int(pc[1].sum()), int(pc[2].sum())) \
            == (tp, fp, fn)

    @pytest.mark.parametrize("seed", [0, 7])
    def test_identical_to_sequential_optimizer(self, seed):
        sc = self._scorer(seed=seed)
        # sequential reference: exactly what optimize_sed_params does
        # without counts_fn
        best_seq, params_seq = autoth.optimize_sed_params(
            sc.score_params, 17, smooth_grid=(1, 5), salt_grid=(1, 5),
            max_iter=6)
        best_fast, params_fast = autoth.optimize_sed_params(
            sc.score_params, 17, smooth_grid=(1, 5), salt_grid=(1, 5),
            max_iter=6, counts_fn=sc.per_class_counts)
        assert best_fast == best_seq
        assert params_fast["n_smooth"] == params_seq["n_smooth"]
        assert params_fast["n_salt"] == params_seq["n_salt"]
        np.testing.assert_array_equal(params_fast["sed_high_threshold"],
                                      params_seq["sed_high_threshold"])
        np.testing.assert_array_equal(params_fast["sed_low_threshold"],
                                      params_seq["sed_low_threshold"])
