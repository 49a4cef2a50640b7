"""Training losses (reference: ``pytorch/losses.py:{clip_bce,get_loss_func}``,
SURVEY.md §2 "Loss").

The reference computes BCE on *probabilities* (its models end in sigmoid).
We keep that public contract (``clip_bce(output_dict, target)``) but clamp
for numerical safety; probabilities come out of the model already f32.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["clip_bce", "frame_bce", "get_loss_func"]

_EPS = 1e-7


def _bce(probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    p = jnp.clip(probs, _EPS, 1.0 - _EPS)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))


def clip_bce(output_dict: dict, target: jnp.ndarray) -> jnp.ndarray:
    """Clip-level binary cross-entropy on weak (multi-hot) labels.

    Mirrors reference ``pytorch/losses.py:clip_bce`` —
    ``F.binary_cross_entropy(clipwise_output, target)`` (mean reduction).
    """
    return jnp.mean(_bce(output_dict["clipwise_output"], target))


def frame_bce(output_dict: dict, target: jnp.ndarray) -> jnp.ndarray:
    """Frame-level BCE for strong labels ``[B, T, C]`` (extension; the
    reference trains on weak labels only, but frame supervision shares the
    same math)."""
    return jnp.mean(_bce(output_dict["framewise_output"], target))


_LOSSES = {"clip_bce": clip_bce, "frame_bce": frame_bce}


def get_loss_func(loss_type: str):
    """String-keyed loss lookup, mirroring ``--loss_type`` in the reference."""
    if loss_type not in _LOSSES:
        raise KeyError(
            f"unknown loss_type {loss_type!r}; available: {sorted(_LOSSES)}")
    return _LOSSES[loss_type]
