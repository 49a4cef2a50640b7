"""Batch generation with seeded shuffling and device prefetch.

Reference surface (SURVEY.md §2 "Data generator"):
``utils/data_generator.py:DataGenerator.{__init__,generate_train,
generate_validate}`` — features in RAM, seeded ``np.random.RandomState``
shuffle, infinite train generator / finite validate generator, per-mel-bin
``scale(x, mean, std)`` normalization.

TPU-native change: the reference assembles batches single-threaded between
optimizer steps (no overlap — SURVEY.md §3.2 flags this). Here a background
thread stages the *next* batch onto device (``jax.device_put``) while the
current step runs, so host batch assembly and TPU compute overlap
(double-buffered prefetch).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .hdf5 import SplitReader, scale

__all__ = ["DataGenerator", "prefetch_to_device"]


class DataGenerator:
    """Yields normalized ``(batch_x, batch_y)`` numpy batches.

    ``feature_source='logmel'`` yields normalized log-mel ``[B, T, mel]``
    (the reference path); ``'waveform'`` yields raw waveforms ``[B, samples]``
    for the fused on-device frontend (normalization then happens on device).
    """

    def __init__(
        self,
        train: SplitReader,
        validate: Optional[SplitReader] = None,
        batch_size: int = 32,
        scalar: Optional[tuple] = None,
        seed: int = 1234,
        feature_source: str = "logmel",
    ):
        self.train = train
        self.validate = validate
        self.batch_size = batch_size
        self.random_state = np.random.RandomState(seed)
        self.mean, self.std = scalar if scalar is not None else (None, None)
        self.feature_source = feature_source
        # waveform transport: when True and the split stores quantized
        # int16 (``_ScaledWaveView``), batches are yielded UNDECODED — the
        # train/eval step decodes on device (``wave_scale`` in
        # train.make_train_step), halving host→device bytes and skipping
        # the host-side f32 materialization. Opt-in (main._build sets it)
        # so external consumers of the generator keep float32 batches.
        self.raw_int16 = False
        # resumable train-stream position (see state_dict/load_state_dict);
        # the lock keeps snapshots consistent while the prefetch producer
        # thread advances the stream.
        self._train_order: Optional[np.ndarray] = None
        self._train_ptr = 0
        self._lock = threading.Lock()

    def _select(self, reader: SplitReader, idx: np.ndarray):
        if self.feature_source == "waveform":
            if reader.waveform is None:
                raise ValueError("split was packed without waveforms")
            if self.raw_int16 and hasattr(reader.waveform, "raw"):
                return (np.asarray(reader.waveform.raw[idx]),
                        reader.target[idx])
            x = reader.waveform[idx]
        else:
            x = reader.feature[idx]
            if self.mean is not None:
                x = scale(x, self.mean, self.std)
        # copy=False: the waveform decode view already hands back float32
        return x.astype(np.float32, copy=False), reader.target[idx]

    def generate_train(self, yield_indices: bool = False) -> Iterator[tuple]:
        """Infinite shuffled batches (reference: ``generate_train``).

        The shuffle order / pointer / RNG stream live on the instance so a
        resumed run continues the data stream instead of restarting it —
        checkpoint them via :meth:`state_dict` (SURVEY.md §5 failure-recovery
        row; the reference restarts its shuffle stream on resume).

        ``yield_indices=True`` yields ``(idx, target)`` instead of the
        selected feature batch — the device-resident-corpus mode (the step
        gathers rows from a bank staged in HBM; see
        ``train.make_train_step(bank=...)``). The RNG/shuffle stream is
        IDENTICAL to the feature-yielding mode, so the two transports train
        on byte-identical batch sequences and share resume state.
        """
        n = len(self.train)
        if self._train_order is None or len(self._train_order) != n:
            self._train_order = np.arange(n)
            self.random_state.shuffle(self._train_order)
            self._train_ptr = 0
        while True:
            with self._lock:
                if self._train_ptr + self.batch_size > n:
                    self.random_state.shuffle(self._train_order)
                    self._train_ptr = 0
                idx = np.sort(
                    self._train_order[self._train_ptr
                                      : self._train_ptr + self.batch_size])
                self._train_ptr += self.batch_size
            if yield_indices:
                yield idx.astype(np.int32), self.train.target[idx]
            else:
                yield self._select(self.train, idx)

    def state_dict(self) -> dict:
        """Serializable train-stream position (RNG state + order + pointer).

        Note: with :func:`prefetch_to_device` the producer thread runs a
        couple of batches ahead of the consumed step, so a state saved at
        iteration *k* resumes the stream within ~prefetch-depth batches of
        where training actually was — the stream continues with unseen data
        rather than replaying from the start.
        """
        with self._lock:
            return {
                "rng_state": self.random_state.get_state(),
                "order": (None if self._train_order is None
                          else self._train_order.copy()),
                "ptr": self._train_ptr,
            }

    def load_state_dict(self, d: dict) -> None:
        with self._lock:
            self.random_state.set_state(d["rng_state"])
            self._train_order = (None if d["order"] is None
                                 else np.asarray(d["order"]))
            self._train_ptr = int(d["ptr"])

    def generate_validate(self, data_type: str = "validate",
                          max_iteration: Optional[int] = None,
                          yield_indices: bool = False) -> Iterator[tuple]:
        """Finite in-order batches over a split (reference:
        ``generate_validate(data_type, max_iteration)``).

        ``yield_indices=True``: the device-resident-corpus transport —
        ``(idx, target)`` pairs for a bank-gather eval step."""
        reader = self.train if data_type == "train" else self.validate
        if reader is None:
            raise ValueError(f"no reader for data_type={data_type!r}")
        n = len(reader)
        it = 0
        for start in range(0, n, self.batch_size):
            if max_iteration is not None and it >= max_iteration:
                return
            idx = np.arange(start, min(start + self.batch_size, n))
            it += 1
            if yield_indices:
                yield idx.astype(np.int32), reader.target[idx]
            else:
                yield self._select(reader, idx)


def prefetch_to_device(iterator, size: int = 2, sharding=None, stage=None):
    """Stage host batches onto device ahead of consumption.

    A bounded background thread calls ``jax.device_put`` (optionally with a
    ``NamedSharding`` so batches land pre-sharded across the mesh) while the
    train step runs — the reference has no such overlap (SURVEY.md §3.2).

    ``stage`` replaces the default whole-item ``device_put`` with a custom
    producer-thread transform (e.g. pad-then-put only the features, keep
    targets on host — the eval path's shape, ``train.forward_generator``).
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                if stage is not None:
                    item = stage(item)
                elif sharding is not None:
                    item = jax.device_put(item, sharding)
                else:
                    item = jax.device_put(item)
                q.put(item)
            q.put(sentinel)
        except BaseException as exc:   # propagate — never fake end-of-data
            q.put(_ProducerError(exc))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, _ProducerError):
            raise RuntimeError(
                "prefetch producer thread failed") from item.exc
        yield item


class _ProducerError:
    """Exception carrier: a producer-thread failure must crash the consumer,
    not masquerade as a clean end-of-stream (ADVICE.md round 1)."""

    def __init__(self, exc: BaseException):
        self.exc = exc
