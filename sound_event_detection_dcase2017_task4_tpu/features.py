"""Feature-extraction CLI: metadata + audio → per-split HDF5 (+ scalar).

Reference surface (SURVEY.md §2 "HDF5 packer CLI", §3.1):
``python utils/features.py calculate_feature_for_all_audio_files
--data_type=... --dataset_dir=... --workspace=...`` followed by
``calculate_scalar``. Same subcommands and output layout here::

    python -m sound_event_detection_dcase2017_task4_tpu.features \
        calculate_feature_for_all_audio_files \
        --dataset_dir=$DATASET_DIR --workspace=$WORKSPACE \
        --data_type=training [--use_pallas]

    python -m ...features calculate_scalar --workspace=$WORKSPACE

    python -m ...features pack_synthetic --workspace=$WORKSPACE \
        --num_train=200 --num_test=40   # self-contained demo corpus

Metadata format: ``<dataset_dir>/metadata/<data_type>_set.csv`` with
tab-separated ``filename<TAB>label1,label2,...`` rows (weak labels); strong
ground truth for testing/evaluation splits lives in
``<dataset_dir>/metadata/groundtruth_strong_label_<data_type>_set.csv`` as
``filename<TAB>onset<TAB>offset<TAB>label`` rows (the DCASE distribution
format). Audio: ``<dataset_dir>/audio/<data_type>/<filename>`` WAV.

TPU-native change vs the reference: extraction runs the batched JAX/Pallas
frontend on device instead of a 51k-file librosa CPU loop (HOT LOOP #1).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List

import numpy as np

from .audio_io import load_wav, save_wav
from .config import DEFAULT, Config, classes_num, lb_to_idx
from .data.hdf5 import calculate_scalar, pack_waveforms_to_hdf5
from .data.synth import make_synthetic_dataset
from .utils import create_folder, create_logging

__all__ = ["read_weak_metadata", "calculate_feature_for_all_audio_files",
           "pack_synthetic", "main"]


def _parse_labels(labelstr: str) -> np.ndarray:
    """Multi-hot vector from a label list string.

    Separator is ``;`` when present, else ``,``. Comma-separated lists are
    ambiguous because two DCASE class names contain commas ("Air horn,
    truck horn", "Fire engine, fire truck (siren)") — fragments are
    greedily re-merged against the known label set so both quoting styles
    of the official metadata parse correctly.
    """
    tgt = np.zeros(classes_num, np.float32)
    labelstr = labelstr.strip().strip('"')
    sep = ";" if ";" in labelstr else ","
    frags = [p.strip() for p in labelstr.split(sep)]
    i = 0
    while i < len(frags):
        matched = False
        # longest match first: a label may span several comma fragments
        for j in range(len(frags), i, -1):
            cand = ", ".join(frags[i:j])
            if cand in lb_to_idx:
                tgt[lb_to_idx[cand]] = 1.0
                i = j
                matched = True
                break
        if not matched:
            i += 1                       # unknown fragment: skip
    return tgt


def read_weak_metadata(path: str) -> tuple[List[str], np.ndarray]:
    """Parse weak-label metadata: ``filename<TAB or ,>labels(;|,-sep)``."""
    names: List[str] = []
    targets: List[np.ndarray] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) == 1:
                parts = line.split(",", 1)
            fname, labelstr = parts[0], parts[-1]
            names.append(fname)
            targets.append(_parse_labels(labelstr))
    return names, np.stack(targets) if targets else np.zeros((0, classes_num))


def calculate_feature_for_all_audio_files(args) -> None:
    """Pack one split: decode WAVs → batched device log-mel → HDF5."""
    cfg = (DEFAULT if args.clip_seconds is None else Config(
        clip_samples=int(DEFAULT.sample_rate * args.clip_seconds)))
    workspace, data_type = args.workspace, args.data_type
    meta_path = os.path.join(args.dataset_dir, "metadata",
                             f"{data_type}_set.csv")
    audio_dir = os.path.join(args.dataset_dir, "audio", data_type)
    out_path = os.path.join(workspace, "features", f"{data_type}.h5")
    create_folder(os.path.dirname(out_path))
    logger = create_logging(os.path.join(workspace, "logs", "features"))

    names, targets = read_weak_metadata(meta_path)
    logger.info("%s: %d clips", data_type, len(names))

    from . import native

    use_native = native.available() and not args.no_native
    logger.info("audio ingest: %s", "C++ threaded" if use_native else "python")

    def waveforms():
        if use_native:
            # C++ thread-pool decode+resample, one chunk ahead of the device
            chunk = max(args.batch_size, 64)
            for i in range(0, len(names), chunk):
                block = native.load_wav_batch(
                    [os.path.join(audio_dir, n) for n in names[i:i + chunk]],
                    cfg.sample_rate, cfg.clip_samples)
                yield from block
        else:
            for name in names:
                wav, _ = load_wav(os.path.join(audio_dir, name),
                                  target_sr=cfg.sample_rate)
                yield wav

    t0 = time.time()
    pack_waveforms_to_hdf5(
        waveforms(), names, targets, out_path, cfg,
        store_waveform=not args.no_waveform, batch_size=args.batch_size,
        use_pallas=args.use_pallas, waveform_dtype=args.waveform_dtype)
    logger.info("packed %s in %.1f s → %s", data_type, time.time() - t0,
                out_path)


def calculate_scalar_cmd(args) -> None:
    """Per-mel-bin mean/std of the training split (reference:
    ``utils/features.py:calculate_scalar``)."""
    feature_path = os.path.join(args.workspace, "features",
                                f"{args.data_type}.h5")
    scalar_path = os.path.join(args.workspace, "scalars",
                               f"{args.data_type}.h5")
    mean, std = calculate_scalar(feature_path, scalar_path)
    print(f"scalar → {scalar_path}  mean[0]={mean[0]:.3f} std[0]={std[0]:.3f}")


def pack_synthetic(args) -> None:
    """Build a self-contained synthetic corpus with the exact reference
    dataset layout (audio/ + metadata/ + packed features), so the full
    pipeline runs without the DCASE distribution."""
    cfg = DEFAULT if args.clip_seconds is None else Config(
        clip_samples=int(DEFAULT.sample_rate * args.clip_seconds))
    splits = {"training": (args.num_train, 0),
              "testing": (args.num_test, 1),
              "evaluation": (args.num_eval, 2)}
    dataset_dir = os.path.join(args.workspace, "synth_dataset")

    for data_type, (n, seed) in splits.items():
        clips = make_synthetic_dataset(n, cfg, seed=seed,
                                       profile=args.profile)
        audio_dir = os.path.join(dataset_dir, "audio", data_type)
        meta_dir = os.path.join(dataset_dir, "metadata")
        create_folder(audio_dir)
        create_folder(meta_dir)
        with open(os.path.join(meta_dir, f"{data_type}_set.csv"), "w") as f:
            for c in clips:
                # ';' separator: two class names contain commas
                active = ";".join(sorted({e[2] for e in c.events}))
                f.write(f"{c.audio_name}\t{active}\n")
        with open(os.path.join(
                meta_dir,
                f"groundtruth_strong_label_{data_type}_set.csv"), "w") as f:
            for c in clips:
                for onset, offset, label in c.events:
                    f.write(f"{c.audio_name}\t{onset:.3f}\t{offset:.3f}\t{label}\n")
        if not args.metadata_only:
            for c in clips:
                save_wav(os.path.join(audio_dir, c.audio_name), c.waveform,
                         cfg.sample_rate)
        # pack features directly from in-memory waveforms (fast path)
        out_path = os.path.join(args.workspace, "features", f"{data_type}.h5")
        create_folder(os.path.dirname(out_path))
        pack_waveforms_to_hdf5(
            (c.waveform for c in clips), [c.audio_name for c in clips],
            np.stack([c.weak_target for c in clips]), out_path, cfg,
            store_waveform=True, use_pallas=args.use_pallas,
            waveform_dtype=args.waveform_dtype)
        print(f"{data_type}: {n} clips → {out_path}")

    scalar_path = os.path.join(args.workspace, "scalars", "training.h5")
    calculate_scalar(os.path.join(args.workspace, "features", "training.h5"),
                     scalar_path)
    print(f"scalar → {scalar_path}")
    print(f"dataset_dir → {dataset_dir}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)

    pa = sub.add_parser("calculate_feature_for_all_audio_files")
    pa.add_argument("--dataset_dir", required=True)
    pa.add_argument("--workspace", required=True)
    pa.add_argument("--data_type", required=True,
                    choices=["training", "testing", "evaluation"])
    pa.add_argument("--batch_size", type=int, default=32)
    pa.add_argument("--clip_seconds", type=float, default=None)
    pa.add_argument("--use_pallas", action="store_true")
    pa.add_argument("--no_waveform", action="store_true")
    pa.add_argument("--waveform_dtype", default="int16",
                    choices=["int16", "float32"],
                    help="storage dtype of the optional waveform dataset; "
                         "int16 (+scale attr) halves disk and read "
                         "bandwidth, lossless for 16-bit sources")
    pa.add_argument("--no_native", action="store_true",
                    help="force the pure-python audio loader")
    pa.set_defaults(func=calculate_feature_for_all_audio_files)

    ps = sub.add_parser("calculate_scalar")
    ps.add_argument("--workspace", required=True)
    ps.add_argument("--data_type", default="training")
    ps.set_defaults(func=calculate_scalar_cmd)

    py = sub.add_parser("pack_synthetic")
    py.add_argument("--workspace", required=True)
    py.add_argument("--num_train", type=int, default=200)
    py.add_argument("--num_test", type=int, default=40)
    py.add_argument("--num_eval", type=int, default=40)
    py.add_argument("--clip_seconds", type=float, default=None)
    py.add_argument("--profile", default="easy", choices=["easy", "hard"],
                    help="'easy' saturates quickly (smoke tests); 'hard' is "
                         "the discriminative benchmark (v2 calibration, see "
                         "data/synth.py) — confusable class families, "
                         "overlapping short events (0.4-2.5 s), -16..+8 dB "
                         "per-event SNR, >=1 unlabeled distractor per clip, "
                         "class imbalance, background-only clips")
    py.add_argument("--use_pallas", action="store_true")
    py.add_argument("--metadata_only", action="store_true",
                    help="skip writing WAV files (features only)")
    py.add_argument("--waveform_dtype", default="int16",
                    choices=["int16", "float32"])
    py.set_defaults(func=pack_synthetic)

    args = p.parse_args(argv)
    from .runtime import enable_compile_cache
    enable_compile_cache()
    args.func(args)


if __name__ == "__main__":
    main()
