"""Host/process communication helpers — TPU-native replacements for the
reference's raw torch.distributed utilities (`src/VANet/utils/comm.py`:
rank/world helpers, pickled-object all_gather, reduce_dict, barrier).

On TPU pods there is no NCCL process group: device collectives are emitted by
XLA inside jitted programs, and HOST-side object exchange goes through
`jax.experimental.multihost_utils`.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Cross-host barrier (reference `comm.py:50-57`)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mmu_barrier")


def all_gather(data: Any) -> list[Any]:
    """Gather arbitrary picklable objects from every host (reference
    `comm.py:63-103` pickles tensors over NCCL; here objects ride
    `multihost_utils.broadcast_one_to_all` / process_allgather)."""
    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils

    import pickle

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    # pad to a common max size
    sizes = multihost_utils.process_allgather(np.asarray([payload.size]))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for row, size in zip(np.asarray(gathered), np.ravel(sizes)):
        out.append(pickle.loads(row[: int(size)].tobytes()))
    return out


def reduce_dict(d: dict[str, Any], average: bool = True) -> dict[str, Any]:
    """Mean/sum scalar dicts across hosts (reference `comm.py:106-132`)."""
    if jax.process_count() == 1:
        return dict(d)
    from jax.experimental import multihost_utils

    keys = sorted(d)
    vals = np.asarray([float(d[k]) for k in keys], np.float32)
    total = np.asarray(multihost_utils.process_allgather(vals)).sum(axis=0)
    if average:
        total = total / jax.process_count()
    return {k: float(v) for k, v in zip(keys, total)}
