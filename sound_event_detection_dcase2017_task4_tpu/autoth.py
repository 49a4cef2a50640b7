"""Automatic threshold optimization (gradient-free).

Reference surface (SURVEY.md §2 "Threshold optimization", §3.5): the
``autoth`` package's ``HyperParamsOptimizer`` used by
``pytorch/main.py:{optimize_at_thresholds,optimize_sed_thresholds}`` —
post-training, per-class decision thresholds are searched to maximize the
metric directly (AT macro-F1, or SED F1/ER), then pickled and applied to the
evaluation split. This is the "automatic threshold optimization" of the
companion paper (arXiv:1912.04761).

``autoth`` is not installed; this is a clean-room optimizer with the same
job: coordinate ascent over per-class thresholds with a shrinking step
schedule (thresholds are independent per class given the score
decomposition, so coordinate ascent converges fast and deterministically —
no stochastic perturbation needed at 17 dimensions).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

__all__ = ["HyperParamsOptimizer", "optimize_thresholds"]


class HyperParamsOptimizer:
    """Maximize ``score_fn(params) -> float`` over bounded per-class params.

    API mirrors the reference's ``autoth.core.HyperParamsOptimizer``:
    ``optimizer.do_optimize(init_params)`` returns ``(best_score, best_params)``.
    """

    def __init__(self, score_fn: Callable[[np.ndarray], float],
                 step: float = 0.02, max_iter: int = 100,
                 bounds: tuple = (0.0, 1.0), verbose: bool = False):
        self.score_fn = score_fn
        self.step = step
        self.max_iter = max_iter
        self.bounds = bounds
        self.verbose = verbose

    def do_optimize(self, init_params: Sequence[float]):
        params = np.asarray(init_params, dtype=np.float64).copy()
        lo, hi = self.bounds
        best = float(self.score_fn(params))
        step = self.step
        evals = 0
        for it in range(self.max_iter):
            improved = False
            for k in range(len(params)):
                for direction in (+1.0, -1.0):
                    cand = params.copy()
                    cand[k] = np.clip(cand[k] + direction * step, lo, hi)
                    if cand[k] == params[k]:
                        continue
                    s = float(self.score_fn(cand))
                    evals += 1
                    if s > best + 1e-12:
                        best, params = s, cand
                        improved = True
                        break
            if self.verbose:
                print(f"iter {it}: score={best:.4f} step={step:.4f}")
            if not improved:
                step *= 0.5                      # anneal
                if step < 1e-3:
                    break
        return best, params


def optimize_thresholds(score_fn: Callable[[np.ndarray], float],
                        classes_num: int,
                        init: float = 0.3,
                        step: float = 0.02,
                        max_iter: int = 50) -> tuple[float, np.ndarray]:
    """Convenience wrapper: optimize one threshold per class."""
    opt = HyperParamsOptimizer(score_fn, step=step, max_iter=max_iter)
    return opt.do_optimize(np.full(classes_num, init))
