"""Evaluator: audio-tagging + SED metrics over a data split.

Reference surface (SURVEY.md §2 "Audio-tagging metrics" / §3.3):
``pytorch/evaluate.py:Evaluator.evaluate`` — clipwise mAP
(``sklearn.metrics.average_precision_score``), AUC, thresholded
precision/recall/F1 per class + macro average; plus segment-based SED
metrics via the decode → submission → sed_eval path.

The compute-heavy part (the forward pass over the split) is the jitted
``eval_step`` from ``train.py``; this module is host-side numpy/sklearn on
the accumulated outputs, same as the reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from sklearn import metrics as skm

from . import scoring, sed
from .config import labels as _default_labels

__all__ = ["tagging_metrics", "Evaluator"]


def tagging_metrics(clipwise: np.ndarray, target: np.ndarray,
                    thresholds=0.3,
                    labels: Sequence[str] = _default_labels) -> Dict:
    """Clip-level (audio tagging) metrics.

    ``thresholds``: scalar or per-class array for the P/R/F1 binarization
    (per-class thresholds feed the autoth optimization, SURVEY.md §3.5).
    """
    classes = clipwise.shape[1]
    thr = np.broadcast_to(np.asarray(thresholds, np.float32), (classes,))

    ap = np.full(classes, np.nan)
    auc = np.full(classes, np.nan)
    for k in range(classes):
        if target[:, k].max() > 0:                 # AP undefined w/o positives
            ap[k] = skm.average_precision_score(target[:, k], clipwise[:, k])
            if target[:, k].min() < 1:             # AUC needs both classes
                auc[k] = skm.roc_auc_score(target[:, k], clipwise[:, k])

    pred = (clipwise >= thr[None, :]).astype(np.float32)
    tp = (pred * target).sum(axis=0)
    fp = (pred * (1 - target)).sum(axis=0)
    fn = ((1 - pred) * target).sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1), 0.0)
        recall = np.where(tp + fn > 0, tp / np.maximum(tp + fn, 1), 0.0)
        f1 = np.where(2 * tp + fp + fn > 0,
                      2 * tp / np.maximum(2 * tp + fp + fn, 1), 0.0)

    valid = target.sum(axis=0) > 0
    return {
        "average_precision": ap,
        "mAP": float(np.nanmean(ap)),
        "auc": auc,
        "mAUC": float(np.nanmean(auc)) if np.isfinite(auc).any() else float("nan"),
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "macro_f1": float(f1[valid].mean()) if valid.any() else 0.0,
        "macro_precision": float(precision[valid].mean()) if valid.any() else 0.0,
        "macro_recall": float(recall[valid].mean()) if valid.any() else 0.0,
        "thresholds": thr,
    }


class Evaluator:
    """Evaluate a model state on a split: AT metrics always, SED metrics when
    strong ground truth is available (reference: ``Evaluator.evaluate``)."""

    def __init__(self, eval_step, labels: Sequence[str] = _default_labels,
                 frames_per_second: int = 100,
                 sed_params: Optional[dict] = None,
                 clip_duration: float = 10.0,
                 sharding=None):
        self.eval_step = eval_step
        self.labels = list(labels)
        self.frames_per_second = frames_per_second
        self.sed_params = sed_params or dict(sed.sed_params_dict)
        self.clip_duration = clip_duration
        # batch NamedSharding → distribute eval batches over the mesh
        # (ragged batches padded/trimmed in forward_generator)
        self.sharding = sharding

    def forward(self, state, generate_func,
                eval_step=None) -> Dict[str, np.ndarray]:
        from .train import forward_generator
        return forward_generator(eval_step or self.eval_step, state,
                                 generate_func, sharding=self.sharding)

    def evaluate(
        self,
        state,
        generate_func,
        audio_names: Optional[List[str]] = None,
        ground_truth_events: Optional[Dict[str, list]] = None,
        at_thresholds=0.3,
        sed_params: Optional[dict] = None,
        eval_step=None,
    ) -> Dict:
        """Full evaluation; returns ``{"at": ..., "sed": ...?}``.

        ``eval_step`` overrides the constructor's step for this call — the
        training loop's device-resident-corpus mode passes a per-split
        bank-gather step here (train and test splits stage separate banks).
        """
        out = self.forward(state, generate_func, eval_step=eval_step)
        result = {"at": tagging_metrics(out["clipwise_output"], out["target"],
                                        at_thresholds, self.labels)}
        if ground_truth_events is not None and audio_names is not None:
            events = sed.frame_prediction_to_event_prediction(
                out["framewise_output"], sed_params or self.sed_params,
                self.frames_per_second, self.labels)
            # the generator may be truncated (training-time eval with
            # --eval_max_iteration): score exactly the evaluated prefix —
            # both the estimates AND the ground truth are restricted to it,
            # or every unevaluated file would count as pure deletions. In a
            # FULL eval the ground truth must stay the complete dict: a gt
            # file missing from audio_names is a real deletion, and dropping
            # it would silently inflate segment F1 (union-of-files
            # semantics, as in sed_fast / optimize_sed_thresholds).
            names = list(audio_names)[: len(events)]
            est = {names[i]: events[i] for i in range(len(names))}
            if len(events) < len(audio_names):
                ref = {n: ground_truth_events[n] for n in names
                       if n in ground_truth_events}
            else:
                ref = ground_truth_events
            result["sed"] = scoring.segment_based_metrics(
                ref, est, self.clip_duration, 1.0, self.labels)
            result["est_events"] = est
        result["outputs"] = out
        return result
