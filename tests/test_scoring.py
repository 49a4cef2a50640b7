"""Hand-computed golden cases for the segment-based ER/F1 scorer
(sed_eval 1-second-segment definition; SURVEY.md §7 step 6)."""

import numpy as np

from sound_event_detection_dcase2017_task4_tpu import scoring

LBL = ["A", "B", "C"]


def test_perfect_prediction():
    ref = {"f1.wav": [(0.0, 3.0, "A"), (5.0, 7.0, "B")]}
    m = scoring.segment_based_metrics(ref, ref, 10.0, 1.0, LBL)
    assert m["overall"]["f_measure"]["f_measure"] == 1.0
    assert m["overall"]["error_rate"]["error_rate"] == 0.0


def test_empty_prediction():
    ref = {"f1.wav": [(0.0, 3.0, "A")]}
    m = scoring.segment_based_metrics(ref, {}, 10.0, 1.0, LBL)
    assert m["overall"]["f_measure"]["f_measure"] == 0.0
    # all deletions: ER = Nref/Nref = 1
    assert m["overall"]["error_rate"]["error_rate"] == 1.0
    assert m["overall"]["error_rate"]["deletion_rate"] == 1.0


def test_substitution():
    # same segments, wrong class → per segment 1 fn + 1 fp = 1 substitution
    ref = {"f.wav": [(0.0, 2.0, "A")]}
    est = {"f.wav": [(0.0, 2.0, "B")]}
    m = scoring.segment_based_metrics(ref, est, 10.0, 1.0, LBL)
    er = m["overall"]["error_rate"]
    assert er["substitution_rate"] == 1.0
    assert er["deletion_rate"] == 0.0
    assert er["insertion_rate"] == 0.0
    assert er["error_rate"] == 1.0
    assert m["overall"]["f_measure"]["f_measure"] == 0.0


def test_partial_overlap_exact():
    # ref event 0..2.5 → segs {0,1,2}; est event 1.0..3.5 → segs {1,2,3}
    # tp = {1,2}; fp = {3}; fn = {0}
    ref = {"f.wav": [(0.0, 2.5, "A")]}
    est = {"f.wav": [(1.0, 3.5, "A")]}
    m = scoring.segment_based_metrics(ref, est, 10.0, 1.0, LBL)
    cw = m["class_wise"]["A"]
    assert (cw["ntp"], cw["nfp"], cw["nfn"]) == (2.0, 1.0, 1.0)
    f1 = m["overall"]["f_measure"]["f_measure"]
    np.testing.assert_allclose(f1, 2 * 2 / (2 * 2 + 1 + 1))
    er = m["overall"]["error_rate"]["error_rate"]
    # per segment: seg0 D, seg3 I → ER = (0 S + 1 D + 1 I) / 3 ref segs
    np.testing.assert_allclose(er, 2.0 / 3.0)


def test_multi_file_accumulation():
    ref = {"a.wav": [(0.0, 1.0, "A")], "b.wav": [(0.0, 1.0, "B")]}
    est = {"a.wav": [(0.0, 1.0, "A")], "b.wav": []}
    m = scoring.segment_based_metrics(ref, est, 10.0, 1.0, LBL)
    np.testing.assert_allclose(
        m["overall"]["f_measure"]["f_measure"], 2 * 1 / (2 * 1 + 0 + 1))


def test_submission_roundtrip(tmp_path):
    events = {"a.wav": [(0.5, 2.25, "Car")], "b.wav": [(0.0, 1.0, "Train")]}
    path = str(tmp_path / "sub.tsv")
    scoring.write_submission(events, path)
    back = scoring.read_ground_truth(path)
    assert back["a.wav"] == [(0.5, 2.25, "Car")]
    assert back["b.wav"] == [(0.0, 1.0, "Train")]


def test_per_file_durations_dict():
    ref = {"a.wav": [(0.0, 1.0, "A")], "b.wav": [(0.0, 1.0, "B")]}
    est = dict(ref)
    m = scoring.segment_based_metrics(
        ref, est, file_durations={"a.wav": 3.0, "b.wav": 5.0},
        time_resolution=1.0, labels=LBL)
    assert m["overall"]["f_measure"]["f_measure"] == 1.0


def test_events_beyond_duration_extend_segments():
    # est event past the nominal duration must still count as insertions
    ref = {"f.wav": [(0.0, 1.0, "A")]}
    est = {"f.wav": [(0.0, 1.0, "A"), (11.0, 12.0, "A")]}
    m = scoring.segment_based_metrics(ref, est, 10.0, 1.0, LBL)
    assert m["class_wise"]["A"]["nfp"] == 1.0


def test_predictions_on_files_absent_from_ref_count_as_insertions():
    """sed_eval scores the union of files: false positives on clips with no
    reference events must cost insertions (ADVICE.md round 1 — iterating
    only over ref silently dropped them, inflating F1)."""
    ref = {"a.wav": [(0.0, 2.0, "A")]}
    est = {"a.wav": [(0.0, 2.0, "A")],
           "noev.wav": [(0.0, 3.0, "B")]}     # not in ground truth at all
    m = scoring.segment_based_metrics(ref, est, 10.0, 1.0, LBL)
    assert m["class_wise"]["B"]["nfp"] == 3.0
    assert m["overall"]["error_rate"]["insertion_rate"] == 3.0 / 2.0
    assert m["overall"]["f_measure"]["f_measure"] < 1.0
