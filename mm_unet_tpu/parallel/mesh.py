"""Device mesh / SPMD utilities.

The reference's only parallelism is DDP over NCCL (Accelerate + torchrun,
SURVEY.md §2.7). TPU-native equivalent: a `jax.sharding.Mesh` with a `data`
axis; the train step is jitted once with the batch sharded over `data` and
parameters replicated — XLA inserts the gradient all-reduce over ICI
automatically (no NCCL analogue needed). Metric reduction is likewise a jnp
mean inside the jitted step (the `accelerator.reduce` equivalent).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` — the
same code then spans hosts (DCN) without change.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_logger = logging.getLogger(__name__)
_warned_shapes: set = set()


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    dev = np.asarray(devices).reshape(shape)
    return Mesh(dev, tuple(axes))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch) dim of every leaf over the mesh axis.
    Leaves whose batch dim is not divisible by the axis size are replicated
    (e.g. ragged validation tails)."""
    n = mesh.shape[axis]

    def put(x):
        if x.ndim == 0 or x.shape[0] % n != 0:
            if n > 1 and x.ndim > 0 and x.shape[:1] not in _warned_shapes:
                _warned_shapes.add(x.shape[:1])
                _logger.warning(
                    "shard_batch: batch dim %d not divisible by %d devices — "
                    "replicating (every device computes the full batch). Pad "
                    "or split the batch to use the mesh.", x.shape[0], n,
                )
            spec = P()
        else:
            spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
