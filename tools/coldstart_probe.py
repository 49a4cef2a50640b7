"""Why does the driver's fresh-process bench pay ~100 s before step 1?

Round-4 verdict item 8: r01 recorded 9.9 s compile+first-step, every
round since has recorded 96-107 s despite the persistent compile cache
(``runtime.enable_compile_cache``). This probe isolates the cost in a
fresh process per cell, timing four phases separately:

* ``backend_s`` — first ``jax.devices()`` (tunnel/backend init);
* ``build_s``  — model/optimizer/state construction (host, traced code);
* ``first_step_s`` — first train-step call: trace + compile (or
  persistent-cache hit) + execute;
* ``second_step_s`` — steady-state step for reference.

Cells: {warm cache, cold cache} × {pallas frontend, XLA frontend}. The
pallas cell exercises the remote Mosaic AOT helper this image routes
kernel compiles through — the round-3 suspect for the cache-immune cost.

Usage (prints one JSON line per cell)::

    python tools/coldstart_probe.py            # all four cells
    python tools/coldstart_probe.py --cell warm_pallas   # one cell
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CELLS = ("warm_pallas", "warm_xla", "cold_pallas", "cold_xla")


def run_cell(cell: str) -> dict:
    """Child body: one fresh-process measurement."""
    sys.path.insert(0, REPO)
    t_import0 = time.perf_counter()
    import jax
    import numpy as np

    from sound_event_detection_dcase2017_task4_tpu.runtime import (
        enable_compile_cache)

    if cell.startswith("cold"):
        os.environ["SEDX_COMPILE_CACHE"] = tempfile.mkdtemp(
            prefix="sedx_coldcache_")
    enable_compile_cache()
    import_s = time.perf_counter() - t_import0

    t0 = time.perf_counter()
    devs = jax.devices()
    backend_s = time.perf_counter() - t0

    import jax.numpy as jnp

    from sound_event_detection_dcase2017_task4_tpu import train
    from sound_event_detection_dcase2017_task4_tpu.config import DEFAULT
    from sound_event_detection_dcase2017_task4_tpu.models import get_model
    from sound_event_detection_dcase2017_task4_tpu.ops.stft import (
        make_logmel_fn)

    t0 = time.perf_counter()
    cfg = DEFAULT
    model = get_model("Cnn_9layers_Gru_FrameAtt", dtype=jnp.bfloat16,
                      remat=False)
    frontend = make_logmel_fn(cfg, use_pallas=cell.endswith("pallas"),
                              precision="fast")
    state, tx = train.create_train_state(model, cfg)
    mean = np.full(cfg.mel_bins, -30.0, np.float32)
    std = np.full(cfg.mel_bins, 15.0, np.float32)
    step = train.make_train_step(model, tx, frontend=frontend,
                                 scalar=(mean, std))
    rng = np.random.RandomState(0)
    xb = jax.device_put((rng.randn(128, cfg.clip_samples) * 0.1
                         ).astype(np.float32))
    yb = jax.device_put((rng.rand(128, 17) < 0.2).astype(np.float32))
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state, m = step(state, xb, yb)
    _ = float(jax.device_get(m["loss"]))
    first_step_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state, m = step(state, xb, yb)
    _ = float(jax.device_get(m["loss"]))
    second_step_s = time.perf_counter() - t0

    return {"cell": cell, "backend": str(devs[0]),
            "import_s": round(import_s, 1),
            "backend_s": round(backend_s, 1),
            "build_s": round(build_s, 1),
            "first_step_s": round(first_step_s, 1),
            "second_step_s": round(second_step_s, 2)}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cell", choices=CELLS)
    p.add_argument("--child", help=argparse.SUPPRESS)
    p.add_argument("--timeout", type=int, default=1500)
    args = p.parse_args(argv)

    if args.child:
        print(json.dumps(run_cell(args.child)), flush=True)
        return

    for cell in ([args.cell] if args.cell else CELLS):
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", cell],
            capture_output=True, text=True, timeout=args.timeout, cwd=REPO)
        wall = time.perf_counter() - t0
        line = (r.stdout.strip().splitlines() or [""])[-1]
        try:
            rec = json.loads(line)
            rec["process_wall_s"] = round(wall, 1)
            print(json.dumps(rec), flush=True)
        except json.JSONDecodeError:
            print(json.dumps({"cell": cell, "error": f"rc={r.returncode}",
                              "tail": r.stderr[-300:]}), flush=True)


if __name__ == "__main__":
    main()
