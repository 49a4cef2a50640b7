"""Benchmark: end-to-end log-mel + CRNN training throughput (clips/sec).

Prints ONE JSON line to stdout:
    {"metric": "...", "value": N, "unit": "clips/sec", "vs_baseline": N}

* value: clips/sec of the fused waveform→logmel→CRNN train step on the
  available TPU chip(s) (the BASELINE.json headline metric), over the
  production transport: an int16 hop-chunk corpus bank staged in HBM,
  rows gathered by index and decoded on device (the `train` CLI's
  device-cache default since round 5). A `legacy_staged2d_step_ms`
  field re-times rounds 1-4's host-staged 2-D f32 transport in the same
  capture for cross-round continuity.
* vs_baseline: ratio to the reference-style CPU pipeline (torch CPU,
  STFT+mel frontend + the same CRNN topology, fwd+bwd+Adam) — the
  BASELINE.json target is >10×. The CPU number is the mean of 10 timed
  steps (spread + torch thread count recorded), cached in
  ``.bench_cpu_baseline.json`` (delete to re-measure). Note this image's
  host has 1 vCPU (nproc=1, torch uses it fully); a multicore workstation
  would narrow the ratio by roughly its core count.

Batches are staged on device before timing: the hosting tunnel caps
host→device bandwidth at ~20 MB/s, which is an artifact of this
environment, not of the pipeline (a real v5e host feeds batches over PCIe
at GB/s; the input pipeline double-buffers — see data/generator.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CPU_CACHE = os.environ.get(
    "SEDX_BENCH_CPU_CACHE", os.path.join(REPO, ".bench_cpu_baseline.json"))

BATCH = 128
STEPS = 30
# timing granularity: STEPS are timed in CHUNKS of this many steps, each
# chunk forced to completion by reading the loss scalar. Chunked (not
# per-step) because a per-step sync read over this hosting tunnel costs
# whole milliseconds of round-trip latency and would pollute the very
# number it measures; 10 chunks of 3 give distribution stats (median /
# min / std) at ~1% sync overhead. Round-4 verdict item 1a.
CHUNK = 3
# second chunk size for the sync-cost elimination (see bench_tpu): long
# enough that the per-chunk sync amortizes to <1 ms/step, short enough
# to stay responsive
LONG_CHUNK = 15
MODEL_TYPE = "Cnn_9layers_Gru_FrameAtt"
# contention sentinel: after the main timing, sleep then re-time one
# chunk; a quiet chip reproduces the median, a chip shared with another
# process (the round-4 BENCH regression's suspected cause) shows spread
CONTENTION_SPREAD = 0.10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu() -> dict:
    import jax

    from sound_event_detection_dcase2017_task4_tpu.runtime import enable_compile_cache
    enable_compile_cache()

    from sound_event_detection_dcase2017_task4_tpu import train
    from sound_event_detection_dcase2017_task4_tpu.config import DEFAULT
    from sound_event_detection_dcase2017_task4_tpu.models import get_model
    from sound_event_detection_dcase2017_task4_tpu.ops.stft import make_logmel_fn
    from sound_event_detection_dcase2017_task4_tpu.parallel import (
        batch_sharding, make_mesh, replicated_sharding)

    import jax.numpy as jnp

    from sound_event_detection_dcase2017_task4_tpu.data.hdf5 import (
        _WAVE_INT16_SCALE)
    from sound_event_detection_dcase2017_task4_tpu.ops.pallas_logmel import (
        prepare_chunks)

    cfg = DEFAULT
    use_pallas = jax.default_backend() == "tpu"
    # production-tuned config: bf16 compute (f32 params), batch 128 without
    # remat (measured fastest on 16 GB v5e: 1303 clips/s vs 1091 at
    # 256+remat — remat's recompute outweighs the batch-size gain here),
    # single-pass-bf16 frontend
    model = get_model(MODEL_TYPE, dtype=jnp.bfloat16, remat=False)
    frontend = make_logmel_fn(cfg, use_pallas=use_pallas, precision="fast")
    state, tx = train.create_train_state(model, cfg)
    mean = np.full(cfg.mel_bins, -30.0, np.float32)
    std = np.full(cfg.mel_bins, 15.0, np.float32)

    mesh = make_mesh()
    state = jax.device_put(state, replicated_sharding(mesh))
    rng = np.random.RandomState(0)
    wave = (rng.randn(BATCH, cfg.clip_samples) * 0.1).astype(np.float32)
    target = (rng.rand(BATCH, 17) < 0.2).astype(np.float32)
    yb = jax.device_put(target, batch_sharding(mesh))

    # HEADLINE transport = the production default (main.py device cache):
    # an int16 hop-chunk bank staged in HBM once; the step's Pallas
    # frontend gathers the clip rows straight from the bank via a
    # scalar-prefetched index map and decodes int16 on the VPU
    # (ops.pallas_logmel.logmel_pallas_bank — no materialized batch, no
    # decoded f32 copy; measured frontend 7.99 → 5.09 ms at batch 128 vs
    # gather-then-kernel). This is what `train` actually runs for
    # in-memory waveform corpora since round 5.
    from sound_event_detection_dcase2017_task4_tpu.ops.stft import (
        make_logmel_bank_fn)

    quant = np.clip(np.round(wave / _WAVE_INT16_SCALE),
                    -32768, 32767).astype(np.int16)
    bank = jax.device_put(prepare_chunks(quant, cfg),
                          replicated_sharding(mesh))
    bank_frontend = make_logmel_bank_fn(
        cfg, use_pallas=use_pallas, precision="fast",
        wave_scale=float(_WAVE_INT16_SCALE))
    step = train.make_train_step(model, tx, frontend=frontend,
                                 scalar=(mean, std), bank=bank,
                                 wave_scale=float(_WAVE_INT16_SCALE),
                                 bank_frontend=bank_frontend)
    xb = jax.device_put(np.arange(BATCH, dtype=np.int32),
                        batch_sharding(mesh))

    t0 = time.perf_counter()
    state, m = step(state, xb, yb)
    _ = float(jax.device_get(m["loss"]))
    log(f"tpu: compile+first step {time.perf_counter() - t0:.1f}s "
        f"(devices={mesh.size}, pallas={use_pallas}, transport=bank)")

    # Timing note: on this hosting setup block_until_ready() can return
    # before remote execution finishes — force completion by reading the
    # loss scalar; state donation chains every step, so each chunk's
    # final loss transitively depends on all of that chunk's steps.
    def time_chunk(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, xb, yb)
        _ = float(jax.device_get(m["loss"]))
        return (time.perf_counter() - t0) / n

    step_s = np.array([time_chunk(CHUNK) for _ in range(STEPS // CHUNK)])
    med = float(np.median(step_s))
    spread = float((step_s.max() - step_s.min()) / med)
    # Each chunk pays one host↔device sync to force completion, and on
    # this hosting tunnel that round trip costs whole milliseconds —
    # folded into a 3-step chunk it inflated the round-4/5 per-step
    # median by ~10% (median 93-94 ms vs long-chunk 85 ms on a quiet
    # chip). Eliminate the constant exactly with a second, longer chunk
    # size: per-step time s solves {C·mC = C·s + c, L·mL = L·s + c}.
    long_s = float(np.median([time_chunk(LONG_CHUNK) for _ in range(3)]))
    per_step = ((LONG_CHUNK * long_s - CHUNK * med)
                / (LONG_CHUNK - CHUNK))
    sync_ms = (med - per_step) * CHUNK * 1e3       # per-chunk sync cost
    # headline clips/s from the sync-corrected per-step time; median over
    # chunks keeps it robust to a transient competitor on the chip
    # (round 4's single 30-step mean had neither property)
    cps = BATCH / per_step
    # continuity leg: rounds 1-4 timed a host-staged 2-D f32 waveform
    # batch (the step re-pays the frontend's pad+relayout every step).
    # Re-time it briefly so the transport win is measured in the SAME
    # capture, not inferred across rounds: two LONG_CHUNKs ≈ <0.1 ms/step
    # sync bias.
    legacy_step = train.make_train_step(model, tx, frontend=frontend,
                                        scalar=(mean, std))
    xl = jax.device_put(wave, batch_sharding(mesh))

    def time_legacy_chunk(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = legacy_step(state, xl, yb)
        _ = float(jax.device_get(m["loss"]))
        return (time.perf_counter() - t0) / n

    time_legacy_chunk(1)                          # compile
    legacy_raw = float(np.median([time_legacy_chunk(LONG_CHUNK)
                                  for _ in range(2)]))
    # sentinel: quiet chip → a re-timed short chunk lands on the median
    time.sleep(2.0)
    sentinel_s = time_chunk(CHUNK)
    sentinel_dev = abs(sentinel_s - med) / med
    contended = bool(spread > CONTENTION_SPREAD
                     or sentinel_dev > CONTENTION_SPREAD)
    # apply the bank path's solved per-chunk sync constant to the legacy
    # leg too (same host round trip), so the two transports compare on
    # equal footing: raw legacy chunks still carry sync/LONG_CHUNK each
    legacy_s = legacy_raw - sync_ms / 1e3 / LONG_CHUNK
    stats = {
        "clips_per_sec": cps,
        "transport": "device-bank-int16-chunked",
        "legacy_staged2d_step_ms": legacy_s * 1e3,
        "step_ms": per_step * 1e3,
        "chunk_sync_ms": sync_ms,
        "step_ms_median": med * 1e3,
        "step_ms_min": float(step_s.min()) * 1e3,
        "step_ms_mean": float(step_s.mean()) * 1e3,
        "step_ms_std": float(step_s.std()) * 1e3,
        "step_spread": round(spread, 4),
        "sentinel_step_ms": sentinel_s * 1e3,
        "sentinel_deviation": round(sentinel_dev, 4),
        "contention_flag": contended,
        "timed_steps": int(len(step_s) * CHUNK + 3 * LONG_CHUNK),
        "chunk": CHUNK,
    }
    log(f"tpu: {cps:.0f} clips/s ({per_step * 1e3:.1f} ms/step after "
        f"removing the ~{sync_ms:.0f} ms/chunk tunnel sync; chunk-{CHUNK} "
        f"median {med * 1e3:.1f} ms, min {stats['step_ms_min']:.1f}, "
        f"std {stats['step_ms_std']:.2f}, spread {spread:.1%}, sentinel "
        f"{sentinel_s * 1e3:.1f} ms [dev {sentinel_dev:.1%}], "
        f"contended={contended}, batch {BATCH}; legacy staged-2D "
        f"transport {legacy_s * 1e3:.1f} ms/step)")
    if contended:
        log("tpu: WARNING — step-time spread exceeds the contention "
            "threshold; another process may share the chip. The median "
            "is published but treat this capture as suspect.")
    return stats


def bench_cpu_reference() -> float:
    """Reference-style pipeline in torch on CPU: STFT+mel frontend + the
    same CRNN topology (4×ConvBlock 64..512 + BiGRU(256) + att head),
    fwd + bwd + Adam. Mirrors SURVEY.md §3.2/§3.4."""
    if os.path.isfile(CPU_CACHE):
        with open(CPU_CACHE) as f:
            cached = json.load(f)
        log(f"cpu: cached baseline {cached['clips_per_sec']:.2f} clips/s")
        return cached["clips_per_sec"]

    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class ConvBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
            self.b1 = nn.BatchNorm2d(cout)
            self.c2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
            self.b2 = nn.BatchNorm2d(cout)

        def forward(self, x):
            x = torch.relu(self.b1(self.c1(x)))
            x = torch.relu(self.b2(self.c2(x)))
            return torch.nn.functional.avg_pool2d(x, 2)

    class Crnn(nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = nn.Sequential(
                ConvBlock(1, 64), ConvBlock(64, 128),
                ConvBlock(128, 256), ConvBlock(256, 512))
            self.gru = nn.GRU(512, 256, batch_first=True, bidirectional=True)
            self.att = nn.Linear(512, 17)
            self.cla = nn.Linear(512, 17)

        def forward(self, x):                    # [B, T, F]
            x = self.blocks(x[:, None]).mean(dim=3).transpose(1, 2)
            x, _ = self.gru(x)
            att = torch.softmax(torch.clamp(self.att(x), -10, 10), dim=1)
            cla = torch.sigmoid(self.cla(x))
            return (att * cla).sum(dim=1)

    sr, n_fft, hop, n_mels = 32000, 1024, 320, 64
    win = torch.hann_window(n_fft)
    from sound_event_detection_dcase2017_task4_tpu.ops.dsp import mel_filterbank
    mel_w = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels, 50, 14000))

    model = Crnn()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    bsz = 4
    wave = torch.randn(bsz, 320000) * 0.1
    target = (torch.rand(bsz, 17) < 0.2).float()

    def step():
        spec = torch.stft(wave, n_fft, hop, window=win, center=True,
                          pad_mode="reflect", return_complex=True)
        power = spec.abs().pow(2).transpose(1, 2)          # [B, T, F]
        logmel = 10.0 * torch.log10(
            torch.clamp(power @ mel_w, min=1e-10))
        logmel = (logmel + 30.0) / 15.0
        out = model(logmel)
        loss = torch.nn.functional.binary_cross_entropy(out, target)
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()                                       # warm-up
    # 30 steps: the 10-step baseline drifted ±40% between rounds (0.68 →
    # 0.97 clips/s), which made the headline ratio noise — mean±std over
    # 30 is stable to a few % on this 1-vCPU host (round-2 verdict item 8)
    n_steps = 30
    times = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    times_arr = np.array(times)
    dt, spread = float(times_arr.mean()), float(times_arr.std())
    cps = bsz / dt
    threads = torch.get_num_threads()
    log(f"cpu: {cps:.2f} clips/s ({dt:.2f} ± {spread:.2f} s/step over "
        f"{n_steps} steps, batch {bsz}, {threads} torch threads)")
    with open(CPU_CACHE, "w") as f:
        json.dump({"clips_per_sec": cps, "batch": bsz, "n_steps": n_steps,
                   "step_seconds_mean": dt, "step_seconds_std": spread,
                   "torch_threads": threads,
                   "measured_at": time.time()}, f)
    return cps


METRIC_NAME = f"logmel+CRNN train throughput (10s clips, batch {BATCH})"

# Backend-resilience knobs (round-3 verdict item 1b): the hosting TPU
# tunnel has died twice at round boundaries — once fast-raising
# UNAVAILABLE (BENCH_r03 rc=1) and once hanging jax.devices() forever.
# Probe the backend in a bounded subprocess before committing the main
# process to an in-process init that may never return.
# worst case (hang-mode tunnel): ATTEMPTS×TIMEOUT + (ATTEMPTS-1)×BACKOFF
# = 540 s before the structured-error line — inside any driver timeout
# that accommodated the 615 s healthy cold-compile run of round 2.
# Healthy backend init is ~10-60 s, so 150 s per probe has ample margin.
PROBE_TIMEOUT_S = int(os.environ.get("SEDX_BENCH_PROBE_TIMEOUT", 150))
PROBE_ATTEMPTS = int(os.environ.get("SEDX_BENCH_PROBE_ATTEMPTS", 3))
PROBE_BACKOFF_S = int(os.environ.get("SEDX_BENCH_PROBE_BACKOFF", 45))
# cold Mosaic remote-compile can hit ~780 s (BASELINE.md); retry is shorter
# because by then the persistent compile cache is warm
BENCH_TIMEOUTS_S = tuple(int(x) for x in os.environ.get(
    "SEDX_BENCH_TIMEOUTS", "1200,600").split(","))


def _round_ratio(ratio: float) -> float:
    """Two significant figures: the denominator is a 1-vCPU torch run whose
    repeat noise is a few %, so more digits would be false precision —
    the absolute clips/sec is the stable headline (docs quote "~1.5k×").
    Sub-10 ratios keep two decimals so e.g. 0.5× doesn't round to 0."""
    if ratio < 10:
        return round(ratio, 2)
    round_to = 10 ** max(0, len(str(int(ratio))) - 2)
    return round(ratio / round_to) * round_to


def _probe_backend() -> tuple[bool, str]:
    """Probe the default JAX backend (shared bounded subprocess probe —
    ``runtime.probe_default_backend``), retrying with backoff: the
    tunnel sometimes recovers within minutes. Only a real TPU passes —
    a quiet CPU fallback must NOT publish a CPU number as the TPU
    headline."""
    from sound_event_detection_dcase2017_task4_tpu.runtime import (
        probe_default_backend)

    last = ""
    for attempt in range(1, PROBE_ATTEMPTS + 1):
        ok, detail = probe_default_backend(PROBE_TIMEOUT_S)
        if ok and detail == "tpu":
            log(f"probe {attempt}/{PROBE_ATTEMPTS}: backend 'tpu' up")
            return True, detail
        last = (f"default backend is '{detail}', not tpu" if ok
                else detail)
        log(f"probe {attempt}/{PROBE_ATTEMPTS} failed: {last}")
        if attempt < PROBE_ATTEMPTS:
            time.sleep(PROBE_BACKOFF_S)
    return False, last


def _bench_tpu_subprocess() -> tuple[dict | None, str]:
    """Run bench_tpu() in a child (so a mid-bench tunnel death can't hang
    this process), with one generous-timeout attempt and one shorter
    retry (compiles are cached by then). Returns (stats_dict, err)."""
    import subprocess
    import tempfile

    for i, t in enumerate(BENCH_TIMEOUTS_S):
        fd, out = tempfile.mkstemp(suffix=".json")   # created, not guessed
        os.close(fd)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--tpu-child", out],
                timeout=t, cwd=REPO)        # stdout/stderr inherited
            if proc.returncode == 0 and os.path.getsize(out) > 0:
                with open(out) as f:
                    return json.load(f), ""
            err = f"tpu bench child rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            err = f"tpu bench child timed out > {t}s"
        except (json.JSONDecodeError, KeyError) as e:
            err = f"tpu bench child wrote malformed result: {e!r}"
        finally:
            if os.path.isfile(out):
                os.unlink(out)
        log(f"bench attempt {i + 1}/{len(BENCH_TIMEOUTS_S)} failed: {err}")
        if i + 1 < len(BENCH_TIMEOUTS_S):
            time.sleep(30)
    return None, err


def main():
    cpu_cps = bench_cpu_reference()
    ok, detail = _probe_backend()
    if not ok:
        # machine-readable failure record instead of a traceback — the
        # round's BENCH artifact stays parseable even with the tunnel dead
        print(json.dumps({
            "metric": METRIC_NAME, "value": None, "unit": "clips/sec",
            "vs_baseline": None,
            "error": f"TPU backend unavailable after {PROBE_ATTEMPTS} "
                     f"probes: {detail}",
        }))
        return
    stats, err = _bench_tpu_subprocess()
    if stats is None:
        print(json.dumps({
            "metric": METRIC_NAME, "value": None, "unit": "clips/sec",
            "vs_baseline": None, "error": err,
        }))
        return
    tpu_cps = stats.pop("clips_per_sec")
    rec = {
        "metric": METRIC_NAME,
        "value": round(tpu_cps, 1),
        "unit": "clips/sec",
        "vs_baseline": _round_ratio(tpu_cps / cpu_cps),
    }
    # distribution + contention evidence (round-4 verdict item 1a): a
    # contended capture is machine-visible instead of silently becoming
    # the round's perf record
    rec.update({k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in stats.items()})
    print(json.dumps(rec))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--tpu-child":
        stats = bench_tpu()
        with open(sys.argv[2], "w") as f:
            json.dump(stats, f)
    else:
        main()
