"""Tests for tagging metrics, autoth optimizer, statistics container, plotting."""

import os
import pickle

import numpy as np
import pytest

from sound_event_detection_dcase2017_task4_tpu import autoth
from sound_event_detection_dcase2017_task4_tpu.evaluate import tagging_metrics
from sound_event_detection_dcase2017_task4_tpu.utils import StatisticsContainer


class TestTaggingMetrics:
    def test_perfect_predictions(self):
        target = np.eye(4, dtype=np.float32)
        m = tagging_metrics(target.copy(), target, 0.5, ["a", "b", "c", "d"])
        assert m["mAP"] == 1.0
        assert m["macro_f1"] == 1.0

    def test_random_baseline_map(self):
        rng = np.random.RandomState(0)
        target = (rng.rand(400, 5) < 0.3).astype(np.float32)
        clip = rng.rand(400, 5).astype(np.float32)
        m = tagging_metrics(clip, target, 0.5, list("abcde"))
        # AP of random scores ≈ positive rate
        assert 0.2 < m["mAP"] < 0.45

    def test_against_sklearn_f1(self):
        from sklearn.metrics import f1_score

        rng = np.random.RandomState(1)
        target = (rng.rand(100, 3) < 0.4).astype(np.float32)
        clip = rng.rand(100, 3).astype(np.float32)
        m = tagging_metrics(clip, target, 0.5, list("abc"))
        for k in range(3):
            ref = f1_score(target[:, k], clip[:, k] >= 0.5)
            np.testing.assert_allclose(m["f1"][k], ref, atol=1e-9)

    def test_per_class_thresholds(self):
        target = np.array([[1, 0], [0, 1], [1, 0]], np.float32)
        clip = np.array([[0.4, 0.1], [0.2, 0.9], [0.45, 0.2]], np.float32)
        # class-0 threshold 0.3 captures both positives; scalar 0.5 misses
        m_lo = tagging_metrics(clip, target, np.array([0.3, 0.5]))
        m_hi = tagging_metrics(clip, target, 0.5)
        assert m_lo["f1"][0] > m_hi["f1"][0]

    def test_no_positives_class_excluded_from_macro(self):
        target = np.zeros((10, 2), np.float32)
        target[:, 0] = 1.0
        clip = np.full((10, 2), 0.9, np.float32)
        m = tagging_metrics(clip, target, 0.5, ["a", "b"])
        assert m["macro_f1"] == 1.0           # class b (no positives) excluded
        assert np.isnan(m["average_precision"][1])


class TestAutoth:
    def test_recovers_known_optimum(self):
        # score peaked at thresholds [0.2, 0.6, 0.4]
        opt = np.array([0.2, 0.6, 0.4])

        def score(thr):
            return -np.abs(np.asarray(thr) - opt).sum()

        best, thr = autoth.optimize_thresholds(score, 3, init=0.5,
                                               step=0.05, max_iter=100)
        np.testing.assert_allclose(thr, opt, atol=0.02)

    def test_monotone_improvement(self):
        rng = np.random.RandomState(0)
        target = (rng.rand(200, 4) < 0.3).astype(np.float32)
        clip = np.clip(target * 0.6 + rng.rand(200, 4) * 0.4, 0, 1)

        def score(thr):
            return tagging_metrics(clip, target, thr)["macro_f1"]

        base = score(np.full(4, 0.3))
        best, thr = autoth.optimize_thresholds(score, 4, init=0.3)
        assert best >= base

    def test_exact_f1_thresholds_dominates_ascent_and_bruteforce(self):
        """The sorted-sweep optimum must match a dense brute-force grid and
        never lose to the coordinate-ascent search."""
        rng = np.random.RandomState(3)
        target = (rng.rand(150, 5) < 0.3).astype(np.float32)
        clip = np.clip(target * 0.5 + rng.rand(150, 5) * 0.5, 0, 1)

        def score(thr):
            return tagging_metrics(clip, target, thr)["macro_f1"]

        exact_thr = autoth.exact_f1_thresholds(clip, target)
        exact = score(exact_thr)

        # brute force per class over a dense grid (macro-F1 is separable)
        grid = np.linspace(1e-4, 1 - 1e-4, 4001)
        brute_thr = np.zeros(5)
        for k in range(5):
            f1s = []
            for t in grid:
                pred = clip[:, k] >= t
                tp = float((pred * target[:, k]).sum())
                fp = float((pred * (1 - target[:, k])).sum())
                fn = float(((~pred) * target[:, k]).sum())
                f1s.append(2 * tp / max(2 * tp + fp + fn, 1e-12))
            brute_thr[k] = grid[int(np.argmax(f1s))]
        np.testing.assert_allclose(exact, score(brute_thr), atol=1e-9)

        ascent, _ = autoth.optimize_thresholds(score, 5, init=0.3)
        assert exact >= ascent - 1e-9

    def test_exact_f1_thresholds_tied_scores(self):
        """A threshold can only cut between distinct scores: with ties, the
        returned threshold must realize the best ACHIEVABLE F1 (prefixes
        ending inside a tie group are unrealizable because `>= thr` takes
        the whole group)."""
        s = np.array([0.9, 0.9] + [0.8] * 9)
        y = np.array([1, 1, 1] + [0] * 8, np.float32)
        thr = autoth.exact_f1_thresholds(s[:, None], y[:, None])

        def f1_at(t):
            pred = s >= t
            tp = float((pred * y).sum())
            fp = float((pred * (1 - y)).sum())
            fn = float(((~pred) * y).sum())
            return 2 * tp / max(2 * tp + fp + fn, 1e-12)

        # achievable optimum is thr in (0.8, 0.9]: F1 = 2*2/(2*2+0+1)=0.8;
        # thr <= 0.8 includes the whole 0.8 tie group (F1 ≈ 0.545)
        assert 0.8 < thr[0] <= 0.9
        best = max(f1_at(t) for t in np.linspace(0.01, 0.99, 999))
        np.testing.assert_allclose(f1_at(thr[0]), best, atol=1e-9)

    def test_exact_f1_thresholds_no_positives_class(self):
        clip = np.random.RandomState(0).rand(20, 3).astype(np.float32)
        target = np.zeros((20, 3), np.float32)
        target[:5, 0] = 1
        thr = autoth.exact_f1_thresholds(clip, target, default=0.42)
        assert thr[1] == 0.42 and thr[2] == 0.42     # untouched
        assert 0 < thr[0] < 1

    def test_sed_params_full_search(self):
        """optimize_sed_params searches per-class (high, low) pairs AND the
        discrete smoothing lengths (SURVEY.md §3.5 — round 1 tied
        low = high/2 and froze n_smooth/n_salt)."""
        opt_high = np.array([0.3, 0.7])
        opt_low = np.array([0.15, 0.4])

        def score(params):
            s = -np.abs(params["sed_high_threshold"] - opt_high).sum()
            s -= np.abs(params["sed_low_threshold"] - opt_low).sum()
            s -= 0.01 * abs(params["n_smooth"] - 15)    # best at 15
            s -= 0.01 * abs(params["n_salt"] - 5)       # best at 5
            return s

        best, p = autoth.optimize_sed_params(score, 2, max_iter=100)
        assert p["n_smooth"] == 15 and p["n_salt"] == 5
        np.testing.assert_allclose(p["sed_high_threshold"], opt_high,
                                   atol=0.06)
        np.testing.assert_allclose(p["sed_low_threshold"], opt_low,
                                   atol=0.06)
        # hysteresis invariant enforced
        assert (p["sed_low_threshold"] <= p["sed_high_threshold"]).all()


class TestStatisticsContainer:
    def test_append_dump_load(self, tmp_path):
        path = str(tmp_path / "statistics.pickle")
        c = StatisticsContainer(path)
        c.append(0, {"at": {"mAP": 0.5}}, "test")
        c.append(1000, {"at": {"mAP": 0.7}}, "test")
        c.dump()
        assert os.path.isfile(path)
        assert os.path.isfile(os.path.splitext(path)[0] + ".jsonl")

        c2 = StatisticsContainer(path)
        c2.load()
        assert len(c2.statistics_list) == 2
        c2.load(resume_iteration=0)
        assert len(c2.statistics_list) == 1

    def test_jsonl_mirror_is_valid(self, tmp_path):
        import json

        path = str(tmp_path / "statistics.pickle")
        c = StatisticsContainer(path)
        c.append(0, {"at": {"f1": np.float32(0.25),
                            "per_class": np.array([1.0, 2.0])}}, "train")
        c.dump()
        with open(os.path.splitext(path)[0] + ".jsonl") as f:
            rec = json.loads(f.readline())
        assert rec["at"]["f1"] == 0.25
        assert rec["at"]["per_class"] == [1.0, 2.0]


def test_plot_results_text_fallback(tmp_path, capsys, monkeypatch):
    from sound_event_detection_dcase2017_task4_tpu import plot_results

    ws = tmp_path
    stats_dir = (ws / "statistics" / "main" / "model_type=TestNet" /
                 "loss_type=clip_bce" / "augmentation=none" / "batch_size=8")
    stats_dir.mkdir(parents=True)
    records = [
        {"iteration": 0, "data_type": "test", "at": {"mAP": 0.3}},
        {"iteration": 1000, "data_type": "test", "at": {"mAP": 0.6}},
    ]
    with open(stats_dir / "statistics.pickle", "wb") as f:
        pickle.dump(records, f)

    out_png = str(ws / "out.png")
    plot_results.main([f"--workspace={ws}", f"--out={out_png}",
                       "--metric=at.mAP"])
    # either a PNG was rendered (matplotlib available) or the text fallback
    if not os.path.isfile(out_png):
        assert "TestNet" in capsys.readouterr().out


def test_plot_results_non_scalar_metric_warns_not_crashes(tmp_path, capsys):
    """A dotted path resolving to an ARRAY (per-class metric without the
    class segment) must produce the friendly no-curves guidance, not a
    TypeError traceback (round-3 advisor finding)."""
    from sound_event_detection_dcase2017_task4_tpu import plot_results

    ws = tmp_path
    stats_dir = (ws / "statistics" / "main" / "model_type=TestNet" /
                 "loss_type=clip_bce" / "augmentation=none" / "batch_size=8")
    stats_dir.mkdir(parents=True)
    records = [{"iteration": 0, "data_type": "test",
                "at": {"mAP": 0.3, "average_precision": [0.1, 0.2, 0.3]}}]
    with open(stats_dir / "statistics.pickle", "wb") as f:
        pickle.dump(records, f)

    with pytest.raises(SystemExit) as exc:   # friendly exit, not TypeError
        plot_results.main([f"--workspace={ws}",
                           f"--out={ws / 'o.png'}",
                           "--metric=at.average_precision"])
    msg = str(exc.value)
    assert "no curves" in msg
    assert "per-class form" in msg
    assert "matched no records" in capsys.readouterr().out


class TestLosses:
    def test_clip_bce_matches_hand_computed(self):
        import jax.numpy as jnp

        from sound_event_detection_dcase2017_task4_tpu.losses import (
            clip_bce, frame_bce, get_loss_func)

        probs = jnp.asarray([[0.9, 0.1]])
        target = jnp.asarray([[1.0, 0.0]])
        expected = -(np.log(0.9) + np.log(0.9)) / 2
        got = float(clip_bce({"clipwise_output": probs}, target))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

        fw = jnp.asarray([[[0.5, 0.5]]])
        ft = jnp.asarray([[[1.0, 0.0]]])
        np.testing.assert_allclose(
            float(frame_bce({"framewise_output": fw}, ft)),
            -np.log(0.5), rtol=1e-5)

        assert get_loss_func("clip_bce") is clip_bce
        import pytest as _pytest

        with _pytest.raises(KeyError):
            get_loss_func("nope")


def test_evaluator_full_sed_path():
    """Evaluator.evaluate end-to-end on a tiny model (AT + SED + events)."""
    import jax

    from sound_event_detection_dcase2017_task4_tpu import train
    from sound_event_detection_dcase2017_task4_tpu.config import Config, labels
    from sound_event_detection_dcase2017_task4_tpu.evaluate import Evaluator
    from sound_event_detection_dcase2017_task4_tpu.models import SedCnn

    cfg = Config()
    model = SedCnn(classes_num=17, channels=(8,), head="att")
    state, _ = train.create_train_state(model, cfg, example_frames=64)
    eval_step = train.make_eval_step(model)
    rng = np.random.RandomState(0)
    x = rng.randn(6, 64, 64).astype(np.float32)
    y = (rng.rand(6, 17) < 0.2).astype(np.float32)

    def gen():
        yield x[:3], y[:3]
        yield x[3:], y[3:]

    names = [f"c{i}.wav" for i in range(6)]
    gt = {n: [(0.0, 0.3, labels[0])] for n in names}
    ev = Evaluator(eval_step, labels, frames_per_second=100,
                   clip_duration=0.64)
    res = ev.evaluate(state, gen(), audio_names=names,
                      ground_truth_events=gt,
                      sed_params={"sed_high_threshold": 0.4,
                                  "sed_low_threshold": 0.2,
                                  "n_smooth": 2, "n_salt": 2})
    assert "at" in res and "sed" in res and "est_events" in res
    assert 0.0 <= res["at"]["mAP"] <= 1.0
    assert res["sed"]["overall"]["error_rate"]["error_rate"] >= 0.0
    assert set(res["est_events"]) == set(names)


def test_evaluator_truncated_generator_scores_evaluated_prefix():
    """--eval_max_iteration truncates the eval generator: the SED scoring
    must cover exactly the evaluated prefix (round-3 regression — with
    audio_names longer than the evaluated clips the decode/name zip
    crashed, and untruncated ground truth would count every unevaluated
    file as deletions)."""
    import numpy as np

    from sound_event_detection_dcase2017_task4_tpu.config import labels
    from sound_event_detection_dcase2017_task4_tpu.evaluate import Evaluator

    n_total, n_eval, t = 6, 4, 50
    rng = np.random.RandomState(0)

    def eval_step(state, batch_x):
        b = batch_x.shape[0]
        return {"clipwise_output": np.full((b, 17), 0.1, np.float32),
                "framewise_output": np.zeros((b, t, 17), np.float32)}

    def gen():
        for i in range(0, n_eval, 2):
            yield (rng.randn(2, t, 64).astype(np.float32),
                   np.zeros((2, 17), np.float32))

    names = [f"clip{i}.wav" for i in range(n_total)]
    gt = {n: [(0.1, 0.3, labels[0])] for n in names}
    ev = Evaluator(eval_step, labels, frames_per_second=100)
    res = ev.evaluate(None, gen(), audio_names=names,
                      ground_truth_events=gt)
    assert set(res["est_events"]) == set(names[:n_eval])
    # only the 4 evaluated files' ground truth is in scope: 4 ref
    # segments, all deleted (no predictions) — not 6
    cw = res["sed"]["class_wise"][labels[0]]
    assert cw["nref"] == n_eval
    assert cw["nfn"] == n_eval


def test_evaluator_full_eval_keeps_union_ground_truth():
    """In a FULL (untruncated) eval, a ground-truth file absent from
    audio_names must still score as deletions — restricting ref to the
    evaluated names would silently inflate segment F1 (round-4 advisor
    finding; union-of-files semantics as in sed_fast /
    optimize_sed_thresholds)."""
    import numpy as np

    from sound_event_detection_dcase2017_task4_tpu.config import labels
    from sound_event_detection_dcase2017_task4_tpu.evaluate import Evaluator

    n_eval, t = 4, 50
    rng = np.random.RandomState(0)

    def eval_step(state, batch_x):
        b = batch_x.shape[0]
        return {"clipwise_output": np.full((b, 17), 0.1, np.float32),
                "framewise_output": np.zeros((b, t, 17), np.float32)}

    def gen():
        for i in range(0, n_eval, 2):
            yield (rng.randn(2, t, 64).astype(np.float32),
                   np.zeros((2, 17), np.float32))

    names = [f"clip{i}.wav" for i in range(n_eval)]
    # one extra gt file that was never evaluated (e.g. decode failure)
    gt = {n: [(0.1, 0.3, labels[0])] for n in names + ["missing.wav"]}
    ev = Evaluator(eval_step, labels, frames_per_second=100)
    res = ev.evaluate(None, gen(), audio_names=names,
                      ground_truth_events=gt)
    assert set(res["est_events"]) == set(names)
    cw = res["sed"]["class_wise"][labels[0]]
    assert cw["nref"] == n_eval + 1     # missing.wav stays in scope
    assert cw["nfn"] == n_eval + 1      # and counts as a deletion
