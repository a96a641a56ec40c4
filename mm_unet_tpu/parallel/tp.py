"""Tensor parallelism for the Mamba mixer (Megatron-style, XLA-native).

The reference's only parallelism is DDP (SURVEY.md §2.7) — TP here is a
TPU-native extension, not a port. The selective scan is embarrassingly
parallel over the `d_inner` channel axis (every (d, n) state evolves
independently; only B/C/x_dbl are shared), so the natural TP layout is the
Megatron pattern over channels:

- ``in_proj_weight``  (2·D_in, d_model): **column-parallel** — xz comes out
  channel-sharded, no communication.
- ``conv1d*_weight/bias``, ``dt_proj*_bias``, ``A*_log``, ``D*``: per-channel
  scan parameters, sharded 1-D over the same axis — the depthwise conv and the
  scan itself then run on local channel blocks with zero communication.
- ``x_proj*_weight`` (R+2N, D_in): **row-parallel** — contracts the sharded
  channel axis; XLA inserts one psum over ICI producing the (small,
  replicated) dt/B/C stream.
- ``dt_proj*_weight`` (D_in, R): column-parallel — dt comes out sharded.
- ``out_proj_weight`` (d_model, D_in): **row-parallel** — the final psum.

Everything is expressed as *parameter shardings only*: GSPMD propagates the
activation layouts and inserts the two collectives per Mamba call (`psum` on
x_dbl and on the output projection). No manual collectives, no shard_map —
the same jitted train step runs DP-only (mesh without a "model" axis) or
DP×TP unchanged.

The fused TPU megakernel computes x_proj *inside* the kernel (contracting the
full channel axis), which is incompatible with channel sharding — under TP,
construct models with ``scan_impl="pallas"`` (or run on the CPU/einsum path)
so the x_proj contraction stays visible to GSPMD. Single-chip benches are
unaffected (no "model" axis → no sharding).
"""

from __future__ import annotations

import re
from typing import Callable, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over the '/'-joined param path, spec builder given the TP axis name).
# Matched against the path SUFFIX so the same rules apply to the params tree
# and to optimizer-state trees (mu/nu mirror the param paths).
MAMBA_TP_RULES: list[tuple[str, Callable[[str], P]]] = [
    (r"in_proj_weight$", lambda ax: P(ax, None)),
    (r"x_proj(_[bs])?_weight$", lambda ax: P(None, ax)),
    (r"dt_proj(_[bs])?_weight$", lambda ax: P(ax, None)),
    (r"dt_proj(_[bs])?_bias$", lambda ax: P(ax)),
    (r"conv1d(_[bs])?_weight$", lambda ax: P(ax, None)),
    (r"conv1d(_[bs])?_bias$", lambda ax: P(ax)),
    (r"A(_[bs])?_log$", lambda ax: P(ax, None)),
    (r"/D(_[bs])?$", lambda ax: P(ax)),
    (r"out_proj_weight$", lambda ax: P(None, ax)),
    (r"in_proj_bias$", lambda ax: P(ax)),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))))
    return "/" + "/".join(parts)


def spec_for(path_str: str, shape: Sequence[int], n_shards: int, axis: str,
             rules=MAMBA_TP_RULES) -> P:
    """First matching rule's PartitionSpec, or replicated. A rule whose
    sharded dimension isn't divisible by the axis size falls back to
    replication (correctness over partitioning — GSPMD padding of scan
    channel blocks would change the kernel's local shapes)."""
    for pat, mk in rules:
        if re.search(pat, path_str):
            spec = mk(axis)
            for dim, name in enumerate(spec):
                if name == axis and (dim >= len(shape) or shape[dim] % n_shards):
                    return P()
            return spec
    return P()


def shard_params(tree, mesh: Mesh, axis: str = "model", rules=MAMBA_TP_RULES):
    """device_put every leaf of a param-like pytree with its TP sharding
    (unmatched leaves replicated). Works on params AND optimizer-state trees
    (paths are matched by suffix)."""
    if axis not in mesh.shape:
        sharding = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
    n = mesh.shape[axis]

    def put(path, x):
        spec = spec_for(_path_str(path), getattr(x, "shape", ()), n, axis, rules)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def tp_param_specs(tree, mesh: Mesh, axis: str = "model", rules=MAMBA_TP_RULES):
    """The PartitionSpec tree `shard_params` would apply (for inspection /
    jit in_shardings)."""
    n = mesh.shape.get(axis, 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: spec_for(_path_str(path), getattr(x, "shape", ()), n, axis, rules),
        tree,
    )
