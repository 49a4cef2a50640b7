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

import json
import os
import re

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint",
           "load_opt_config", "check_opt_config", "prune_checkpoints"]

_FNAME = "{iteration}_iterations.ckpt"
_RE = re.compile(r"^(\d+)_iterations\.ckpt$")


def save_checkpoint(directory: str, state, iteration: int | None = None,
                    opt_config: dict | None = None) -> str:
    """Serialize ``state`` to ``<directory>/<iteration>_iterations.ckpt``.

    ``opt_config`` (the resolved optimizer recipe — see
    ``train.resolve_opt_config``) is written to a ``.optjson`` sidecar so
    eval/serving can reconstruct the exact ``opt_state`` pytree layout
    without the caller re-passing ``--warmup_steps``/``--grad_clip``
    (round-3 verdict: warmup/clip silently fork the checkpoint layout per
    model family).
    """
    if iteration is None:
        iteration = int(jax.device_get(state.step))
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, _FNAME.format(iteration=iteration))
    data = serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)                      # atomic: no torn checkpoints
    if opt_config is not None:
        side = _sidecar_path(path)
        with open(side + ".tmp", "w") as f:
            json.dump(opt_config, f)
        os.replace(side + ".tmp", side)
    return path


def _sidecar_path(ckpt_path: str) -> str:
    return ckpt_path[: -len(".ckpt")] + ".optjson" \
        if ckpt_path.endswith(".ckpt") else ckpt_path + ".optjson"


def load_opt_config(ckpt_path: str) -> dict | None:
    """The ``.optjson`` optimizer recipe saved next to ``ckpt_path``
    (None for pre-round-4 checkpoints, which have no sidecar)."""
    side = _sidecar_path(ckpt_path)
    if not os.path.isfile(side):
        return None
    with open(side) as f:
        return json.load(f)


# keys whose value changes the opt_state PYTREE LAYOUT (warmup 0<->nonzero
# adds the schedule count; clip 0<->nonzero adds the chain stage) — a
# mismatch there makes deserialization structurally wrong. learning_rate
# is a scalar inside adam: it never changes the layout, and overriding it
# at resume is a legitimate tweak, so it only warns.
_STRUCTURAL_KEYS = ("warmup_steps", "grad_clip")


def check_opt_config(ckpt_path: str, expected: dict) -> None:
    """Raise with a clear message if the checkpoint's recorded optimizer
    recipe disagrees STRUCTURALLY with ``expected`` — such a mismatch
    means the caller's opt_state template has a different pytree layout
    and deserialization would fail (or worse, silently mis-map leaves).
    Non-structural differences (learning_rate) log a warning only."""
    saved = load_opt_config(ckpt_path)
    if saved is None:
        return                                  # legacy checkpoint: trust caller
    diffs = {k: (saved.get(k), expected.get(k))
             for k in _STRUCTURAL_KEYS
             if saved.get(k) != expected.get(k)}
    if diffs:
        raise ValueError(
            f"optimizer config mismatch for {ckpt_path}: the checkpoint "
            f"was written with {saved} but this run resolved {expected} "
            f"(differing structural keys: {diffs}). Re-run with matching "
            "--warmup_steps/--grad_clip, or drop the flags to auto-adopt "
            "the checkpoint's recorded recipe.")
    soft = {k: (saved[k], expected[k]) for k in saved
            if k not in _STRUCTURAL_KEYS and k in expected
            and saved[k] != expected[k]}
    if soft:
        import logging

        logging.getLogger(__name__).warning(
            "optimizer config differs non-structurally for %s: %s "
            "(checkpoint value, this run's value) — proceeding; the "
            "run's value wins", ckpt_path, soft)


def load_checkpoint(path: str, state_template, opt_config: dict | None = None):
    """Restore a :class:`TrainState` pytree from ``path``.

    ``state_template`` supplies the pytree structure/shapes (create it with
    ``create_train_state`` on the same model/optimizer config). Passing the
    resolved ``opt_config`` validates it against the checkpoint's recorded
    recipe first (see :func:`check_opt_config`).
    """
    if opt_config is not None:
        check_opt_config(path, opt_config)
    with open(path, "rb") as f:
        data = f.read()
    state = serialization.from_bytes(jax.device_get(state_template), data)
    # device_get gives numpy leaves; put them back as jax arrays.
    return jax.tree_util.tree_map(
        lambda x: jax.numpy.asarray(x) if isinstance(x, np.ndarray) else x,
        state)


def prune_checkpoints(directory: str, keep: int,
                      protect: tuple = ()) -> list[str]:
    """Delete all but the ``keep`` highest-iteration checkpoints
    (including their ``.optjson`` / ``.datastate.pkl`` sidecars).

    ``protect`` lists iterations never deleted (e.g. the current best-mAP
    iteration, so ``--iteration best`` keeps working). ``keep <= 0`` is a
    no-op (the reference keeps every checkpoint — that stays the
    default). Returns the deleted checkpoint paths."""
    if keep <= 0 or not os.path.isdir(directory):
        return []
    its = sorted(int(m.group(1)) for name in os.listdir(directory)
                 if (m := _RE.match(name)))
    victims = [i for i in its[:-keep] if i not in set(protect)]
    deleted = []
    for i in victims:
        base = os.path.join(directory, _FNAME.format(iteration=i))
        for path in (base, _sidecar_path(base),
                     base.replace(".ckpt", ".datastate.pkl")):
            if os.path.isfile(path):
                os.unlink(path)
        deleted.append(base)
    return deleted


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
