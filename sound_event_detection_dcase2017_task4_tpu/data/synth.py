"""Synthetic DCASE-style dataset for tests, demos and benchmarks.

The reference has no test suite (SURVEY.md §4); its acceptance oracle is the
real DCASE 2017 Task 4 corpus, which is not distributable with this repo.
This module builds a miniature corpus with the same *shape*: 10 s clips at
32 kHz, 17-class weak labels for training, strong (onset/offset) labels for
evaluation — each class keyed to a distinct timbre (harmonic stack + AM
pattern) so models can actually learn the mapping in a few hundred steps.
"""

from __future__ import annotations

import numpy as np

from ..config import Config, DEFAULT, classes_num, idx_to_lb

__all__ = ["SynthClip", "make_synthetic_dataset"]


class SynthClip:
    __slots__ = ("waveform", "audio_name", "weak_target", "events")

    def __init__(self, waveform, audio_name, weak_target, events):
        self.waveform = waveform          # [clip_samples] float32
        self.audio_name = audio_name
        self.weak_target = weak_target    # [classes] float32 multi-hot
        self.events = events              # list of (onset_s, offset_s, label)


def _class_tone(cls: int, t: np.ndarray, rng: np.random.RandomState):
    """A distinct, learnable timbre per class: fundamental + harmonics + AM."""
    f0 = 180.0 * (1.22 ** cls)            # 180 Hz … ~6 kHz across 17 classes
    sig = np.zeros_like(t)
    for h, amp in ((1, 1.0), (2, 0.5), (3, 0.25)):
        sig += amp * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
    am = 0.6 + 0.4 * np.sin(2 * np.pi * (1.0 + 0.5 * (cls % 5)) * t)
    return (sig * am).astype(np.float32)


def make_synthetic_dataset(
    num_clips: int = 20,
    cfg: Config = DEFAULT,
    seed: int = 0,
    max_events_per_clip: int = 3,
    snr_db: float = 12.0,
):
    """Return a list of :class:`SynthClip` with weak + strong labels."""
    rng = np.random.RandomState(seed)
    sr = cfg.sample_rate
    clips = []
    for i in range(num_clips):
        wave = rng.randn(cfg.clip_samples).astype(np.float32)
        wave *= 10.0 ** (-snr_db / 20.0)
        weak = np.zeros(classes_num, np.float32)
        events = []
        clip_dur = cfg.clip_samples / sr
        for _ in range(rng.randint(1, max_events_per_clip + 1)):
            cls = int(rng.randint(classes_num))
            dur = float(rng.uniform(min(0.5, 0.25 * clip_dur),
                                    min(4.0, 0.8 * clip_dur)))
            onset = float(rng.uniform(0.0, clip_dur - dur))
            s0, s1 = int(onset * sr), int((onset + dur) * sr)
            t = np.arange(s1 - s0) / sr
            env = np.minimum(1.0, np.minimum(
                np.arange(s1 - s0) / (0.02 * sr),
                np.arange(s1 - s0)[::-1] / (0.02 * sr)))
            wave[s0:s1] += 0.3 * env.astype(np.float32) * _class_tone(cls, t, rng)
            weak[cls] = 1.0
            events.append((onset, onset + dur, idx_to_lb[cls]))
        peak = np.abs(wave).max()
        if peak > 1.0:
            wave /= peak
        clips.append(SynthClip(wave, f"synth_{i:05d}.wav", weak, events))
    return clips
