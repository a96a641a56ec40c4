"""Pipeline parallelism: GPipe over a `stage` mesh axis.

The reference's only parallelism is DDP (SURVEY.md §2.7 — Accelerate over
NCCL); pipeline parallelism is a TPU-native extension in the same family as
`parallel/tp.py` and `parallel/sp.py`: scale past one chip's HBM by placing
contiguous groups of layers on different chips and streaming microbatches
through them.

Idiomatic-TPU design — no send/recv runtime, no schedules interpreted at
run time: the whole pipeline is ONE jitted SPMD program.

* The per-layer parameter pytree is stacked along a leading `n_layer` axis
  and sharded over the `stage` mesh axis (`P("stage")`) — each chip holds
  its contiguous `n_layer/S` layer group, so parameter memory scales 1/S.
* Inside `jax.shard_map`, a `lax.scan` runs the classic GPipe tick loop:
  at tick ``t`` stage ``s`` processes microbatch ``t - s`` and hands its
  activation to stage ``s+1`` with a single `lax.ppermute` ring hop (ICI
  neighbour traffic, no all-to-all).  ``M + S - 1`` ticks drain ``M``
  microbatches; the ``S-1`` bubble ticks compute on throwaway values that
  never reach an output (and therefore contribute zero gradient).
* The last stage's outputs are broadcast back with one masked `psum`, so
  `pipeline_apply` is a drop-in differentiable function: `jax.grad` through
  it yields exact parameter gradients (ppermute/psum transpose cleanly),
  stacked along the same sharded layer axis.

Composes with data parallelism: put the mesh's `data` axis in `batch_spec`
and every stage pipeline runs on its own batch shard.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def stack_layer_params(layer_params: Sequence[Any]):
    """Stack per-layer parameter pytrees along a new leading `n_layer` axis.

    All layers must share one tree structure (uniform blocks). Shard the
    result's leading axis over the `stage` mesh axis to give each chip its
    contiguous layer group.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_params)


def make_stage_fn(block_apply: Callable[[Any, Any], Any]) -> Callable[[Any, Any], Any]:
    """Lift a single-layer ``block_apply(layer_params, x) -> x`` into a stage
    function over a LOCAL stacked parameter group (leading axis =
    layers-per-stage, static under jit)."""

    def stage_fn(local_params, x):
        n_local = jax.tree_util.tree_leaves(local_params)[0].shape[0]
        for l in range(n_local):
            pl = jax.tree_util.tree_map(lambda a, _l=l: a[_l], local_params)
            x = block_apply(pl, x)
        return x

    return stage_fn


def pipeline_apply(
    stage_fn: Callable[[Any, Any], Any],
    stacked_params,
    x,
    *,
    mesh: Mesh,
    axis: str = "stage",
    num_microbatches: int,
    batch_spec: P = P(),
):
    """Run ``x`` through ``S = mesh.shape[axis]`` pipeline stages.

    - ``stage_fn(local_params, x) -> y``: one stage's computation; ``x`` and
      ``y`` must share pytree structure/shape (activations flow stage to
      stage unchanged in layout).
    - ``stacked_params``: leaves with a leading layer axis divisible by S
      (see `stack_layer_params`); sharded here with ``P(axis)``.
    - ``x``: activation pytree, leading batch dim divisible by
      ``num_microbatches`` (after any `data`-axis sharding in
      ``batch_spec``).
    - ``batch_spec``: PartitionSpec of the activations over the OTHER mesh
      axes (e.g. ``P("data")`` to compose with data parallelism); must not
      mention ``axis``.

    Returns the pipeline output with the same sharding as ``x`` (replicated
    over ``axis`` via one masked psum). Differentiable in both arguments.
    """
    if axis in (batch_spec or ()):
        raise ValueError(f"batch_spec {batch_spec} must not mention the {axis!r} axis")
    n_layer = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    S = mesh.shape[axis]
    if n_layer % S:
        raise ValueError(f"n_layer {n_layer} not divisible by {axis} axis size {S}")
    M = num_microbatches

    def body(params, xg):
        s_idx = jax.lax.axis_index(axis)
        S_ = jax.lax.axis_size(axis)
        is_first = s_idx == 0
        is_last = s_idx == S_ - 1

        def to_mb(a):
            if a.shape[0] % M:
                raise ValueError(
                    f"local batch {a.shape[0]} not divisible by "
                    f"num_microbatches {M}"
                )
            return a.reshape((M, a.shape[0] // M) + a.shape[1:])

        xm = jax.tree_util.tree_map(to_mb, xg)
        recv0 = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a[0]), xm)

        def tick(recv, t):
            it = jnp.minimum(t, M - 1)
            inp = jax.tree_util.tree_map(
                lambda full, r: jnp.where(is_first, full[it], r), xm, recv
            )
            out = stage_fn(params, inp)
            if S_ > 1:
                send = jax.lax.ppermute(
                    out, axis, [(i, (i + 1) % S_) for i in range(S_)]
                )
            else:
                send = out
            return send, out

        _, ys = jax.lax.scan(tick, recv0, jnp.arange(M + S_ - 1))
        # ticks S-1 .. M+S-2 of the LAST stage hold microbatches 0..M-1;
        # un-microbatch and broadcast them to every stage with a masked psum.
        def collect(a):
            flat = a[S_ - 1 :].reshape((-1,) + a.shape[2:])
            return jax.lax.psum(jnp.where(is_last, flat, 0.0), axis)

        return jax.tree_util.tree_map(collect, ys)

    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    # jit the sharded body (same reason as parallel/sp.py: eager shard_map
    # transposition is unsupported; inlined when already inside a jit).
    return jax.jit(shard)(stacked_params, x)


# ---------------------------------------------------------------------------
# Mamba LM integration
# ---------------------------------------------------------------------------


def mixer_pipeline_forward(
    model,
    variables,
    input_ids: Array,
    *,
    mesh: Mesh,
    axis: str = "stage",
    num_microbatches: int,
    batch_spec: P = P(),
) -> Array:
    """`models.lm.MixerModel.__call__` with the n_layer Mamba blocks
    pipelined over the `stage` mesh axis.

    The embedding lookup and final norm are computed replicated (they are
    O(B·L·d) next to the blocks' O(B·L·d²)); the uniform prenorm `Block`
    stack — where the parameters and FLOPs live — is stage-sharded. Output
    equals the sequential forward (same per-sample arithmetic; microbatch
    splitting is over the batch axis only).
    """
    from flax import linen as nn

    from mm_unet_tpu.models.mamba import Block

    params = variables["params"]
    embed = params["embedding"]["embedding"]
    h = jnp.take(embed, input_ids, axis=0)

    stacked = stack_layer_params(
        [params[f"layers_{i}"] for i in range(model.n_layer)]
    )
    block = Block(
        dim=model.d_model,
        rms_norm=model.rms_norm,
        fused_add_norm=model.fused_add_norm,
        mamba_kwargs={"d_state": model.d_state, "bimamba_type": "none"},
    )

    def block_apply(p, hr):
        h_, res = hr
        # zeros stand in for the first block's residual=None: Block computes
        # residual = h + residual, and h + 0 == h exactly.
        return tuple(block.apply({"params": p}, h_, res))

    h, residual = pipeline_apply(
        make_stage_fn(block_apply),
        stacked,
        (h, jnp.zeros_like(h)),
        mesh=mesh,
        axis=axis,
        num_microbatches=num_microbatches,
        batch_spec=batch_spec,
    )
    final = h + residual
    norm_cls = nn.RMSNorm if model.rms_norm else nn.LayerNorm
    return norm_cls().apply({"params": params["norm_f"]}, final)
