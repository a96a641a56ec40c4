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

    Ragged batches (B % n_devices != 0) are PADDED to the next multiple by
    wrapping around real samples (keeps BatchNorm statistics in-distribution,
    unlike zero padding) and a per-sample weight vector marks the real rows.

    Returns ``(sharded_tree, weight)`` where ``weight`` is a (B_padded,) f32
    array sharded over the same axis — 1.0 for real samples, 0.0 for pad.
    Feed it to ``train_step(sample_weight=...)`` / the loss so pad samples
    contribute nothing (the reference's DDP equivalent is Accelerate's even
    batch split; replicating the full batch on every device — the previous
    behaviour — silently wasted the mesh).
    """
    n = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(batch)
    bsz = leaves[0].shape[0] if leaves and getattr(leaves[0], "ndim", 0) > 0 else 0
    pad = (-bsz) % n

    def put(x):
        if x.ndim == 0 or x.shape[0] != bsz:
            if n > 1 and x.ndim > 0 and x.shape[:1] not in _warned_shapes:
                _warned_shapes.add(x.shape[:1])
                _logger.warning(
                    "shard_batch: leaf batch dim %s != batch size %d — "
                    "replicating this leaf.", x.shape[:1], bsz,
                )
            return jax.device_put(x, NamedSharding(mesh, P()))
        if pad:
            idx = np.arange(bsz + pad) % bsz  # wrap-pad with real samples
            x = np.take(np.asarray(x), idx, axis=0)
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    weight = np.ones(bsz + pad, np.float32)
    if pad:
        weight[bsz:] = 0.0
    weight = jax.device_put(weight, NamedSharding(mesh, P(axis)))
    return jax.tree_util.tree_map(put, batch), weight


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
