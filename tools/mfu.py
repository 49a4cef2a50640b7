"""MFU / roofline calculator for the bench train step.

Round-4 verdict item 4: the repo argued perf vs a torch-CPU baseline and
vs its own history, but never vs the hardware. This tool computes the
bench-config CRNN train step's FLOPs from XLA's OWN cost analysis (not a
hand count, so the denominator can't drift as the model changes) and
divides by the measured step time and the chip's bf16 peak:

    MFU = flops_per_step / step_seconds / peak_flops

Usage:
    python tools/mfu.py                 # uses the recorded 84.3 ms step
    python tools/mfu.py --step_ms 83.1  # e.g. the device-trace time

Runs entirely on CPU (lowering only, no execution, no TPU tunnel): the
HLO flop count is platform-independent. The XLA (non-Pallas) frontend
variant is lowered; the Pallas kernel computes the same math with a
trimmed DFT basis (ops/pallas_logmel.py), so the count is within ~2%
conservative. Peak: TPU v5e = 197 TFLOP/s bf16 (public spec).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_BF16_PEAK = 197e12
STEP_MS_DEFAULT = 84.3   # round-2b wall clock (RESULTS.md; bench 1519 c/s)

# the measured configuration IS bench.py's — import its constants so this
# denominator can't drift from the thing being measured
from bench import BATCH, MODEL_TYPE  # noqa: E402


def step_flops(batch: int = BATCH) -> float:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sound_event_detection_dcase2017_task4_tpu import train
    from sound_event_detection_dcase2017_task4_tpu.config import DEFAULT
    from sound_event_detection_dcase2017_task4_tpu.models import get_model
    from sound_event_detection_dcase2017_task4_tpu.ops.stft import (
        make_logmel_fn)

    cfg = DEFAULT
    model = get_model(MODEL_TYPE, dtype=jnp.bfloat16,
                      remat=False)
    frontend = make_logmel_fn(cfg, use_pallas=False, precision="fast")
    state, tx = train.create_train_state(model, cfg)
    scalar = (np.full(cfg.mel_bins, -30.0, np.float32),
              np.full(cfg.mel_bins, 15.0, np.float32))
    step = train.make_train_step(model, tx, frontend=frontend,
                                 scalar=scalar, donate_state=False)
    wave = np.zeros((batch, cfg.clip_samples), np.float32)
    tgt = np.zeros((batch, 17), np.float32)
    lowered = step.lower(state, wave, tgt)
    ca = lowered.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--step_ms", type=float, default=STEP_MS_DEFAULT,
                   help="measured train-step wall time (ms) at batch 128")
    p.add_argument("--peak", type=float, default=V5E_BF16_PEAK,
                   help="chip peak FLOP/s (default: v5e bf16)")
    args = p.parse_args(argv)

    fl = step_flops()
    sustained = fl / (args.step_ms / 1e3)
    print(json.dumps({
        "flops_per_step": fl,
        "gflop_per_clip": round(fl / BATCH / 1e9, 2),
        "step_ms": args.step_ms,
        "clips_per_sec": round(BATCH / (args.step_ms / 1e3), 1),
        "sustained_tflops": round(sustained / 1e12, 1),
        "peak_tflops": round(args.peak / 1e12, 1),
        "mfu": round(sustained / args.peak, 3),
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
