"""Checkpoint save/restore with deterministic resume.

Reference surface (SURVEY.md §5 "Checkpoint / resume"):
``torch.save({'iteration', model state_dict, optimizer state})`` every ~1000
iterations to ``$WORKSPACE/checkpoints/<run-config>/<iter>_iterations.pth``;
``train(--resume_iteration)`` reloads and continues the step count.

TPU-native version: the whole :class:`train.TrainState` pytree (params,
batch_stats, optimizer state, PRNG key, step) is serialized with flax
msgpack — restoring it resumes bit-deterministically, including the
augmentation RNG stream, which the reference cannot do (torch RNG state is
not saved there). File naming keeps the reference's
``<iteration>_iterations.*`` convention so tooling can sort checkpoints.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]

_FNAME = "{iteration}_iterations.ckpt"
_RE = re.compile(r"^(\d+)_iterations\.ckpt$")


def save_checkpoint(directory: str, state, iteration: int | None = None) -> str:
    """Serialize ``state`` to ``<directory>/<iteration>_iterations.ckpt``."""
    if iteration is None:
        iteration = int(jax.device_get(state.step))
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, _FNAME.format(iteration=iteration))
    data = serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)                      # atomic: no torn checkpoints
    return path


def load_checkpoint(path: str, state_template):
    """Restore a :class:`TrainState` pytree from ``path``.

    ``state_template`` supplies the pytree structure/shapes (create it with
    ``create_train_state`` on the same model/optimizer config).
    """
    with open(path, "rb") as f:
        data = f.read()
    state = serialization.from_bytes(jax.device_get(state_template), data)
    # device_get gives numpy leaves; put them back as jax arrays.
    return jax.tree_util.tree_map(
        lambda x: jax.numpy.asarray(x) if isinstance(x, np.ndarray) else x,
        state)


def latest_checkpoint(directory: str) -> str | None:
    """Highest-iteration checkpoint path in ``directory`` (or None)."""
    if not os.path.isdir(directory):
        return None
    best, best_it = None, -1
    for name in os.listdir(directory):
        m = _RE.match(name)
        if m and int(m.group(1)) > best_it:
            best, best_it = os.path.join(directory, name), int(m.group(1))
    return best
