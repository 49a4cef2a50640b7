"""Unit tests for tools/hard_benchmark.py's run collection.

Seed is not part of the reference workspace layout (SURVEY.md §2: run
config dirs key on model/loss/augmentation/batch only), so seed repeats
into one workspace overwrite ``statistics.pickle``; the matrix report must
instead collect the per-run timestamped backups and be robust to crashed
partial runs and the broken-BN control sub-workspace.
"""

import os
import pickle
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import hard_benchmark  # noqa: E402

import pytest

# CPU-compile-heavy: excluded from the fast tier (pytest -m "not slow")
pytestmark = pytest.mark.slow



def _write_run(ws, model, ts, records, batch_size=32):
    d = os.path.join(ws, "statistics", "main", f"model_type={model}",
                     "loss_type=clip_bce", "augmentation=mixup",
                     f"batch_size={batch_size}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"statistics_{ts}.pickle"), "wb") as f:
        pickle.dump(records, f)
    # the main pickle is whatever the LAST run left behind
    with open(os.path.join(d, "statistics.pickle"), "wb") as f:
        pickle.dump(records, f)


def _rec(iteration, mAP, data_type="test"):
    return {"iteration": iteration, "data_type": data_type,
            "at": {"mAP": mAP}, "sed": {"f_measure": mAP / 2}}


def test_collect_one_record_per_seed_run(tmp_path):
    ws = str(tmp_path)
    mt = "Cnn_9layers_Gru_FrameAtt"
    # seed A then seed B overwrote statistics.pickle; backups survive
    _write_run(ws, mt, "2026-01-01_00-00-00",
               [_rec(0, 0.1), _rec(3000, 0.8)])
    _write_run(ws, mt, "2026-01-01_01-00-00",
               [_rec(0, 0.1), _rec(3000, 0.9)])
    recs = hard_benchmark._collect(ws, mt, 32)
    assert len(recs) == 2
    assert sorted(r["at"]["mAP"] for r in recs) == [0.8, 0.9]


def test_collect_drops_crashed_partial_run(tmp_path):
    ws = str(tmp_path)
    mt = "Cnn_9layers_AvgPooling"
    _write_run(ws, mt, "2026-01-01_00-00-00", [_rec(0, 0.13)])   # crashed
    _write_run(ws, mt, "2026-01-01_01-00-00",
               [_rec(0, 0.1), _rec(3000, 0.85)])
    recs = hard_benchmark._collect(ws, mt, 32)
    assert [r["at"]["mAP"] for r in recs] == [0.85]


def test_collect_finds_seed_subworkspaces_excludes_control(tmp_path):
    ws = str(tmp_path)
    mt = hard_benchmark.CONTROL_MODEL
    _write_run(os.path.join(ws, "seed_1234"), mt,
               "2026-01-01_00-00-00", [_rec(3000, 0.9)])
    _write_run(os.path.join(ws, "seed_777"), mt,
               "2026-01-01_01-00-00", [_rec(3000, 0.88)])
    _write_run(os.path.join(ws, "control_bn_momentum_0.5"), mt,
               "2026-01-01_02-00-00", [_rec(3000, 0.5)])
    healthy = hard_benchmark._collect(ws, mt, 32)
    assert sorted(r["at"]["mAP"] for r in healthy) == [0.88, 0.9]
    ctrl = hard_benchmark._collect(
        os.path.join(ws, "control_bn_momentum_0.5"), mt, 32,
        exclude_control=False)
    assert [r["at"]["mAP"] for r in ctrl] == [0.5]


def test_sub_workspace_symlinks_shared_features(tmp_path):
    ws = str(tmp_path)
    os.makedirs(os.path.join(ws, "features"))
    open(os.path.join(ws, "features", "training.h5"), "w").close()
    sub = hard_benchmark._sub_workspace(ws, "seed_42")
    assert os.path.isfile(os.path.join(sub, "features", "training.h5"))
    # idempotent
    assert hard_benchmark._sub_workspace(ws, "seed_42") == sub


def test_mixup_no_targets_control_poisons_only_features():
    """The mixup-bug control must mix features while leaving targets as the
    primary example's (the planted bug), and must restore cleanly."""
    import jax
    import jax.numpy as jnp

    from sound_event_detection_dcase2017_task4_tpu import train as train_mod

    orig = train_mod.mixup
    try:
        hard_benchmark.CONTROLS["mixup_no_targets"]()
        rng = jax.random.PRNGKey(0)
        x = jnp.arange(8.0).reshape(4, 2)
        y = jnp.eye(4)
        mx, my = train_mod.mixup(rng, x, y, alpha=1.0)
        ox, oy = orig(rng, x, y, alpha=1.0)
        assert jnp.allclose(mx, ox)          # features: the healthy mix
        assert jnp.array_equal(my, y)        # targets: NOT mixed (the bug)
        assert not jnp.array_equal(oy, y)    # healthy mixup does mix them
    finally:
        train_mod.mixup = orig


def test_collect_finds_named_control_subworkspaces(tmp_path):
    ws = str(tmp_path)
    mt = hard_benchmark.CONTROL_MODEL
    _write_run(os.path.join(ws, "seed_1234"), mt,
               "2026-01-01_00-00-00", [_rec(3000, 0.9)])
    _write_run(os.path.join(ws, "control_mixup_no_targets"), mt,
               "2026-01-01_02-00-00", [_rec(3000, 0.6)])
    healthy = hard_benchmark._collect(ws, mt, 32)
    assert [r["at"]["mAP"] for r in healthy] == [0.9]
    ctrl = hard_benchmark._collect(
        os.path.join(ws, "control_mixup_no_targets"), mt, 32,
        exclude_control=False)
    assert [r["at"]["mAP"] for r in ctrl] == [0.6]


def test_has_completed_run_resume_gate(tmp_path):
    ws = str(tmp_path)
    mt = "Cnn_9layers_AvgPooling"
    assert not hard_benchmark._has_completed_run(ws, mt, 32, 3000)
    _write_run(ws, mt, "2026-01-01_00-00-00", [_rec(0, 0.1), _rec(1500, 0.4)])
    assert not hard_benchmark._has_completed_run(ws, mt, 32, 3000)  # partial
    _write_run(ws, mt, "2026-01-01_01-00-00", [_rec(3000, 0.8)])
    assert hard_benchmark._has_completed_run(ws, mt, 32, 3000)
    assert not hard_benchmark._has_completed_run(ws, mt, 64, 3000)  # other bs


def test_no_normalization_control_identity_scalar(tmp_path):
    """The forgot-to-normalize control must return identity (0, 1) scalars
    with the real shapes, and patch BOTH the data module and main's
    imported name."""
    import numpy as np

    from sound_event_detection_dcase2017_task4_tpu.data import hdf5 as h5mod
    from sound_event_detection_dcase2017_task4_tpu import main as main_mod
    from sound_event_detection_dcase2017_task4_tpu.data.hdf5 import (
        calculate_scalar)
    import h5py

    feat = tmp_path / "training.h5"
    with h5py.File(feat, "w") as hf:
        hf.create_dataset("feature", data=np.random.RandomState(0)
                          .randn(4, 10, 64).astype(np.float32) * 5 - 30)
    scal = tmp_path / "scalar.h5"
    calculate_scalar(str(feat), str(scal))

    orig_h5, orig_main = h5mod.load_scalar, main_mod.load_scalar
    try:
        hard_benchmark.CONTROLS["no_normalization"]()
        mean, std = h5mod.load_scalar(str(scal))
        assert mean.shape == (64,) and std.shape == (64,)
        np.testing.assert_array_equal(mean, 0)
        np.testing.assert_array_equal(std, 1)
        assert main_mod.load_scalar is h5mod.load_scalar
    finally:
        h5mod.load_scalar = orig_h5
        main_mod.load_scalar = orig_main


def test_ordering_conclusion_printed_only_with_seed_repeats(tmp_path,
                                                            capsys):
    """The family-ordering line needs >= 2 runs per family (single-seed
    orderings were what round 3 over-read); with repeats it marks each
    adjacent gap as separated or within-noise."""
    import json

    ws = str(tmp_path)
    for model, means in [(m, (0.2 + 0.1 * i, 0.21 + 0.1 * i))
                         for i, m in enumerate(hard_benchmark.MODELS)]:
        for seed, m in zip((1, 2), means):
            d = os.path.join(ws, f"seed_{seed}")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(
                    d, f"full_eval_{model}_bs32_it3000.json"), "w") as f:
                json.dump({"at": {"mAP": m},
                           "sed": {"overall": {"f_measure":
                                               {"f_measure": 0.5}}}}, f)
    hard_benchmark._print_full_table(ws, 32)
    out = capsys.readouterr().out
    assert "family ordering" in out
    assert "  <  " in out           # 0.1 gaps >> 0.005 stds: separated

    # drop one family to a single run: the conclusion must stay silent
    os.unlink(os.path.join(ws, "seed_2",
                           f"full_eval_{hard_benchmark.MODELS[0]}"
                           "_bs32_it3000.json"))
    hard_benchmark._print_full_table(ws, 32)
    assert "family ordering" not in capsys.readouterr().out
