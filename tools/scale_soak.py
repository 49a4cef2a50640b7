"""Real-corpus-scale rehearsal: disk-backed streaming train + full-split
inference, with RSS tracking.

Round-4 verdict item 8: before the real 51k-clip DCASE corpus ever shows
up, shake out HDF5 streaming / memory issues at ≥10k-clip scale. This
driver runs, against an ALREADY-PACKED workspace (see
``features pack_synthetic``):

1. a ``--lazy_data --feature_source=waveform`` training soak (the
   production path: h5py-backed reads, no split in RAM, frontend on
   device) for ``--iterations`` steps, sampling the subprocess's peak
   RSS once per second;
2. a full evaluation-split ``inference`` + ``calculate_metrics`` pass
   (also lazy), RSS-sampled the same way.

Emits one JSON line: peak RSS of both phases, train clips/s (steady-state
mean over the logged eval-interval windows), and the eval clip count.
Platform follows the ambient JAX config (TPU when the tunnel is up; the
streaming/RSS behavior under test is platform-independent).

Usage::

    python tools/scale_soak.py --workspace=/tmp/scalews \
        [--iterations=300] [--batch_size=32] [--model=Cnn_9layers_Gru_FrameAtt]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_sampled(cmd, env=None) -> tuple[int, float, str]:
    """Run ``cmd``; return (rc, peak_rss_bytes, captured_output)."""
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            env=env, cwd=REPO)
    peak = 0
    lines: list[str] = []

    def sample():
        nonlocal peak
        while proc.poll() is None:
            try:
                with open(f"/proc/{proc.pid}/status") as f:
                    for ln in f:
                        if ln.startswith("VmRSS:"):
                            peak = max(peak, int(ln.split()[1]) * 1024)
                            break
            except OSError:
                return
            time.sleep(1.0)

    t = threading.Thread(target=sample, daemon=True)
    t.start()
    for ln in proc.stdout:
        lines.append(ln)
        print(ln, end="", flush=True)
    rc = proc.wait()
    t.join(timeout=2)
    return rc, peak, "".join(lines)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workspace", required=True)
    p.add_argument("--iterations", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--model", default="Cnn_9layers_Gru_FrameAtt")
    p.add_argument("--eval_interval", type=int, default=100)
    args = p.parse_args(argv)

    cli = [sys.executable, "-m",
           "sound_event_detection_dcase2017_task4_tpu.main"]
    common = [f"--workspace={args.workspace}",
              f"--model_type={args.model}",
              f"--batch_size={args.batch_size}", "--lazy_data",
              "--feature_source=waveform", "--augmentation=mixup"]

    rc, train_rss, out = _run_sampled(
        cli + ["train", *common,
               f"--stop_iteration={args.iterations}",
               f"--eval_interval={args.eval_interval}",
               "--eval_max_iteration=2"])
    if rc != 0:
        raise SystemExit(f"train soak failed rc={rc}")
    # steady-state clips/s from the per-eval-window log lines
    cps = [float(m.group(1))
           for m in re.finditer(r"\((\d+(?:\.\d+)?) clips/s\)", out)]

    rc, infer_rss, out = _run_sampled(
        cli + ["inference", *common, "--data_type=evaluation"])
    if rc != 0:
        raise SystemExit(f"inference failed rc={rc}")
    m = re.search(r"clipwise \((\d+), ", out)
    n_eval = int(m.group(1)) if m else None

    rc, _, _ = _run_sampled(
        cli + ["calculate_metrics", *common, "--data_type=evaluation",
               f"--metrics_out={args.workspace}/scale_soak_metrics.json"])
    if rc != 0:
        raise SystemExit(f"calculate_metrics failed rc={rc}")

    print(json.dumps({
        "iterations": args.iterations,
        "batch_size": args.batch_size,
        "train_peak_rss_gb": round(train_rss / 2**30, 2),
        "train_clips_per_sec": (round(sum(cps) / len(cps), 1)
                                if cps else None),
        "inference_peak_rss_gb": round(infer_rss / 2**30, 2),
        "eval_clips": n_eval,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
