"""tools/scale_soak.py end-to-end smoke on a tiny workspace (the 10k-clip
rehearsal itself is documented in RESULTS.md; this pins the driver)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# CPU-compile-heavy: excluded from the fast tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


def test_scale_soak_smoke(tmp_path):
    from sound_event_detection_dcase2017_task4_tpu import features

    ws = str(tmp_path / "ws")
    features.main([
        "pack_synthetic", f"--workspace={ws}",
        "--num_train=8", "--num_test=4", "--num_eval=4",
        "--clip_seconds=0.5", "--metadata_only",
    ])
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scale_soak.py"),
         f"--workspace={ws}", "--iterations=2", "--batch_size=4",
         "--eval_interval=2"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-800:] + proc.stderr[-800:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["eval_clips"] == 4
    assert rec["train_peak_rss_gb"] > 0
    assert rec["inference_peak_rss_gb"] > 0
    assert os.path.isfile(os.path.join(ws, "scale_soak_metrics.json"))
