"""Full-pipeline CLI integration test on CPU (SURVEY.md §4 "Integration"):
synthetic corpus → pack → train N steps → inference → metrics → autoth.
Uses 0.5 s clips and a tiny batch so the whole flow runs in ~a minute.
"""

import os
import pickle

import pytest

from sound_event_detection_dcase2017_task4_tpu import features, main
from sound_event_detection_dcase2017_task4_tpu.data.hdf5 import read_split


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


def test_resume_training(workspace):
    main.main(["train", f"--workspace={workspace}", *COMMON,
               "--stop_iteration=8", "--resume_iteration=6",
               "--eval_interval=100"])
    ckpt_dir = os.path.join(
        workspace, "checkpoints", "main",
        "model_type=Cnn_5layers_AvgPooling", "loss_type=clip_bce",
        "augmentation=none", "batch_size=4")
    assert os.path.isfile(os.path.join(ckpt_dir, "8_iterations.ckpt"))


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
