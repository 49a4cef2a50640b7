"""Serving: load a trained run and predict on raw waveforms.

The reference has no serving surface (inference is the batch
``calculate_metrics`` flow); this module packages the same model into a
deployable predictor, TPU-style: one jitted function containing the fused
log-mel frontend, normalization, the model forward and (optionally) the
on-device SED binarization (``sed.binarize_jax``), so a served request does
a single device round trip — waveform in, clip probabilities + binary
event-activity out. Host-side work is only run-length extraction to
``(onset, offset, label)`` tuples.

Usage::

    predictor = Predictor.from_workspace(workspace, model_type=..., ...)
    result = predictor(waveform_batch)          # probs only
    events = predictor.detect_events(waveform_batch)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from . import checkpoints, sed, train as train_lib
from .config import Config, DEFAULT, labels as _default_labels
from .data.hdf5 import load_scalar
from .models import get_model
from .ops.stft import make_logmel_fn

__all__ = ["Predictor"]


class Predictor:
    def __init__(self, model, state, cfg: Config = DEFAULT,
                 scalar: Optional[tuple] = None,
                 sed_params: Optional[dict] = None,
                 labels: Sequence[str] = _default_labels,
                 use_pallas: Optional[bool] = None):
        self.cfg = cfg
        self.labels = list(labels)
        self.sed_params = dict(sed.sed_params_dict, **(sed_params or {}))
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        frontend = make_logmel_fn(cfg, use_pallas=use_pallas,
                                  precision="fast")
        self._state = state
        params = self.sed_params

        def predict_fn(state, waveform):
            x = frontend(waveform)
            if scalar is not None:
                mean, std = scalar
                x = (x - np.asarray(mean)) / np.maximum(np.asarray(std), 1e-8)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False)
            active = sed.binarize_jax(
                out["framewise_output"],
                params["sed_high_threshold"], params["sed_low_threshold"],
                params["n_smooth"], params["n_salt"])
            return out["clipwise_output"], out["framewise_output"], active

        self._predict = jax.jit(predict_fn)

    @classmethod
    def from_workspace(cls, workspace: str, model_type: str,
                       run_config: str, cfg: Config = DEFAULT,
                       iteration: Optional[int] = None,
                       sed_params: Optional[dict] = None,
                       dtype=None) -> "Predictor":
        """Load the latest (or given-iteration) checkpoint of a training run.

        ``run_config`` is the reference-style path segment, e.g.
        ``"loss_type=clip_bce/augmentation=mixup/batch_size=32"``.
        ``dtype`` sets the serving compute dtype (params stay f32 —
        checkpoints interchange freely); defaults to bf16 on TPU, f32
        elsewhere.
        """
        import jax.numpy as jnp

        if dtype is None:
            dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                     else jnp.float32)
        model = get_model(model_type, dtype=dtype)
        state, _ = train_lib.create_train_state(model, cfg)
        ckpt_dir = os.path.join(workspace, "checkpoints", "main",
                                f"model_type={model_type}", run_config)
        path = (os.path.join(ckpt_dir, f"{iteration}_iterations.ckpt")
                if iteration is not None
                else checkpoints.latest_checkpoint(ckpt_dir))
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        state = checkpoints.load_checkpoint(path, state)
        scalar = load_scalar(os.path.join(workspace, "scalars", "training.h5"))
        return cls(model, state, cfg, scalar=scalar, sed_params=sed_params)

    def __call__(self, waveform: np.ndarray) -> Dict[str, np.ndarray]:
        """``[B, clip_samples] → {clipwise, framewise, event_activity}``."""
        clip, frame, active = self._predict(self._state, waveform)
        return {"clipwise_output": np.asarray(clip),
                "framewise_output": np.asarray(frame),
                "event_activity": np.asarray(active)}

    def detect_events(self, waveform: np.ndarray
                      ) -> List[List[tuple]]:
        """``[B, clip_samples] → per-clip [(onset_s, offset_s, label)]``."""
        out = self(waveform)
        return sed.events_from_binary(
            out["event_activity"], self.cfg.frames_per_second, self.labels)
