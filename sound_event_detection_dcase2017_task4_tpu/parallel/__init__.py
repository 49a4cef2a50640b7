"""Device-mesh parallelism: data-parallel sharding over ICI.

The reference is strictly single-process single-GPU (SURVEY.md §2:
"Parallelism strategies present in the reference: NO" / "Distributed
communication backend: none"). This package supplies the TPU-native
equivalent the rebuild adds: a ``jax.sharding.Mesh`` over the chips, batch
axis sharded, parameters replicated; XLA emits the ``psum`` gradient
all-reduce and cross-chip BatchNorm reductions over ICI from the sharding
annotations — there is no hand-written communication code to port.
"""

from .mesh import (batch_sharding, make_mesh, make_mesh_for_batch,
                   replicated_sharding, shard_batch)

__all__ = ["make_mesh", "make_mesh_for_batch", "batch_sharding",
           "replicated_sharding", "shard_batch"]
