"""Mesh construction + canonical shardings for data-parallel SED training.

Scaling model (cf. the "How to Scale Your Model" recipe): this workload is a
few-M-parameter CNN on 10 s clips — activations and params are tiny, so the
only parallelism worth paying for is **data parallel** over the batch axis
(SURVEY.md §2 rows "Parallelism (all kinds)" / "Distributed comm backend").
TP/PP/SP/EP would shard matrices that already fit in one core's VMEM and
add latency for nothing; they are deliberately out of scope.

Design: one 1-D mesh axis ``"data"`` over all local devices. Batches are
sharded on axis 0, every parameter/optimizer tensor is replicated. Under
``jax.jit`` the arrays are *global*: XLA inserts the ``psum`` for gradient
all-reduce and for global-batch BatchNorm statistics automatically, and
those collectives ride ICI. Multi-host (DCN) would only need
``jax.distributed.initialize`` before mesh creation — not needed for v5e-8.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch"]

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over ``devices`` (default: all local)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_for_batch(batch_size: int,
                        devices: Optional[Sequence] = None,
                        axis_name: str = DATA_AXIS) -> Mesh:
    """Largest mesh whose size divides ``batch_size`` (a global batch must
    shard evenly on the data axis)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (batch) across the mesh; trailing axes replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host batch (array or pytree) sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
