"""ZeRO-1 optimizer-state sharding (TPU-native, GSPMD).

The reference's DDP replicates the Adam moments on every rank (SURVEY.md
§2.7 — `accelerate` wraps torch DDP, no ZeRO). On TPU the flat
single-vector AdamW (`mm_unet_tpu/train/optim.py::flat_adamw`) makes ZeRO-1
a pure sharding annotation: the `m`/`v`/`wd` state vectors are laid out
``P("data")`` over the mesh, so each device stores and updates 1/n of the
moments. GSPMD then turns the elementwise moment update into sharded
compute and inserts ONE all-gather of the parameter delta where the flat
update vector is unravelled back onto the (replicated) parameters — exactly
the ZeRO-1 communication pattern (grads are already reduced across `data`
by the loss psum; each device reads its local slice of the replicated
gradient for free).

Memory: the f32 `m`+`v`+`wd` vectors drop from 3·P to 3·P/n per device.
No math changes anywhere — the same jitted `train_step` runs sharded or
replicated depending only on how the state was `device_put`.

Under tensor parallelism the trainer uses the per-leaf optax path instead
(`trainer.flat_optimizer: false`), where the moments inherit the TP
parameter shardings via `tp.shard_params` — a model-axis memory split of
the same flavour; ZeRO-1 over `data` applies to the flat path only (conv
leaf dims are rarely divisible by the mesh; the flat vectors always are:
flat_adamw zero-pads them to a fixed multiple of 256, so any mesh axis up
to 256 devices shards them evenly with a topology-independent checkpoint
layout).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# flat_adamw state keys that hold full-length f32 vectors worth sharding
_FLAT_VECTOR_KEYS = ("m", "v", "wd")


def is_flat_adamw_state(opt_state) -> bool:
    """True when `opt_state` is the flat_adamw dict ({count, m, v, wd} with
    1-D moment vectors, plus the optional per-big-leaf {bm, bv} of the
    hybrid path — see `optim.flat_adamw(big_leaf_elems=...)`)."""
    return (
        isinstance(opt_state, dict)
        and {"count", "m", "v", "wd"}.issubset(opt_state)
        and set(opt_state) <= {"count", "m", "v", "wd", "bm", "bv"}
        and all(getattr(opt_state[k], "ndim", None) == 1 for k in _FLAT_VECTOR_KEYS)
    )


def shard_opt_state(opt_state, mesh: Mesh, axis: str = "data"):
    """ZeRO-1: place the flat AdamW moment vectors sharded over `axis`;
    everything else (count, or any non-flat optimizer state) replicated.

    Returns the state tree with every leaf explicitly device_put (so it can
    be passed straight into the jitted train step on a multi-device mesh).
    """
    repl = NamedSharding(mesh, P())
    n = mesh.shape.get(axis, 1)
    if (
        n == 1
        or not is_flat_adamw_state(opt_state)
        # flat_adamw pads to a multiple of 256, which covers every
        # power-of-two axis ≤256; an odd axis size that doesn't divide the
        # padded length (device_put rejects uneven shards) replicates instead
        or int(opt_state["m"].shape[0]) % n
    ):
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), opt_state)
    vec = NamedSharding(mesh, P(axis))
    return {
        k: (
            jax.device_put(v, vec)
            if k in _FLAT_VECTOR_KEYS
            # bm/bv (hybrid big-leaf moments) and count replicate; per-leaf
            # sharding of the big moments would need divisible leaf dims
            else jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), v)
        )
        for k, v in opt_state.items()
    }
