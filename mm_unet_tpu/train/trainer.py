"""Jitted SPMD train/val steps and the epoch loops.

Structure mirrors the reference trainer (`/root/reference/train.py:28-139`):
per-step loss dict logging, post-transform (sigmoid -> threshold 0.5) metric
accumulation, per-epoch aggregate, model selection on `Val/mean f1`
(`train.py:139`). TPU-first: the whole optimizer step (forward, loss,
backward, AdamW update, BatchNorm stat update) is ONE jitted program over the
device mesh; gradients reduce over ICI via GSPMD instead of NCCL all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from mm_unet_tpu.train.losses import LOSS_REGISTRY
from mm_unet_tpu.train.optim import build_optimizer, warmup_cosine_epoch_schedule

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: Any = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def create_train_state(model, config, rng, sample_input) -> TrainState:
    # Compile the init as one program on every backend: with the persistent
    # compilation cache enabled (conftest / bench / graft entry), repeat runs
    # load the executable instead of recompiling, which beats eager op-by-op
    # dispatch even on CPU.
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, sample_input
    )
    # torch .pth backbone warm start when the model's config block names one
    # (reference in-__init__ loads, e.g. src/DuAT/DuAT.py:332-337)
    from mm_unet_tpu.utils.torch_convert import warm_start_variables

    variables = warm_start_variables(variables, config)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tcfg = config.trainer
    steps_per_epoch = int(tcfg.get("steps_per_epoch", 1) or 1)
    schedule = warmup_cosine_epoch_schedule(
        base_lr=float(tcfg.lr),
        warmup_epochs=int(tcfg.warmup),
        max_epochs=int(tcfg.num_epochs),
        steps_per_epoch=steps_per_epoch,
        warmup_start_lr=float(tcfg.get("warmup_start_lr", 0.0) or 0.0),
    )
    tx = build_optimizer(
        params,
        opt=tcfg.get("optimizer", "adamw"),
        lr=schedule,
        weight_decay=float(tcfg.get("weight_decay", 0.05)),
        betas=(0.9, 0.95),
        # flat (single-vector) AdamW ravels the whole tree — that implicit
        # all-gather would undo tensor-parallel param shardings, so TP runs
        # set flat_optimizer: false to keep the per-leaf optax path (which
        # preserves each leaf's GSPMD sharding through the update).
        flat=bool(tcfg.get("flat_optimizer", True)),
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def make_loss_fn(loss_functions: dict[str, dict], loss_weights: dict[str, float]):
    """loss_functions: {name: kwargs} over LOSS_REGISTRY entries."""

    def compute(logits, labels, weight=None):
        losses = {}
        total = 0.0
        for name, kwargs in loss_functions.items():
            base = name if name in LOSS_REGISTRY else name.replace("_loss", "") + "_loss"
            fn = LOSS_REGISTRY.get(name, LOSS_REGISTRY.get(base))
            val = fn(logits, labels, weight=weight, **kwargs)
            losses[name] = val
            total = total + loss_weights.get(name, 1.0) * val
        return total, losses

    return compute


def seg_stats(logits, labels, weight=None) -> dict:
    """Sufficient statistics for the 7-metric dict, computed on device.

    post_trans = sigmoid -> threshold 0.5 (reference `train.py:193-195`), then
    per-(sample, channel) intersection / prediction-sum / target-sum. Every
    epoch metric (Dice, mIoU, f1, precision, recall, MCC, accuracy) is a
    function of these plus the static pixel count — so the host fetches a few
    (B, C) scalars per step instead of the full-resolution prediction maps
    (which serialized host/device every step in round 1)."""
    preds = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
    t = labels.astype(jnp.float32)
    dims = tuple(range(2, preds.ndim))
    npix = 1
    for d in dims:
        npix *= preds.shape[d]
    stats = {
        "inter": jnp.sum(preds * t, dims),  # (B, C)
        "psum": jnp.sum(preds, dims),
        "tsum": jnp.sum(t, dims),
        "npix": npix,  # static python int
    }
    if weight is not None:
        stats["weight"] = weight  # (B,): 0 marks shard_batch pad rows
    return stats


@functools.partial(jax.jit, static_argnames=("loss_fn", "has_batch_stats"), donate_argnums=(0,))
def train_step(state: TrainState, images, labels, dropout_rng, loss_fn,
               has_batch_stats=True, sample_weight=None):
    """One fused optimizer step. Returns (state, scalars, metric stats).

    `sample_weight` (B,) is the mask from `shard_batch` — pad rows (weight 0)
    contribute nothing to the loss, gradients or metric statistics."""

    def loss_wrapped(params):
        variables = {"params": params}
        # NOTE mutable must be False (not []) in the stat-less branch: flax
        # returns a (y, {}) tuple for ANY collection list, empty included
        mutable = False
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        out = state.apply_fn(
            variables, images, train=True, mutable=mutable,
            rngs={"dropout": dropout_rng},
        )
        logits, new_vars = out if mutable else (out, {})
        total, losses = loss_fn(logits, labels, weight=sample_weight)
        return total, (losses, logits, new_vars)

    (total, (losses, logits, new_vars)), grads = jax.value_and_grad(
        loss_wrapped, has_aux=True
    )(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    state = state.replace(
        step=state.step + 1,
        params=new_params,
        opt_state=new_opt,
        batch_stats=new_vars.get("batch_stats", state.batch_stats),
    )
    scalars = {"total_loss": total, **losses}
    return state, scalars, seg_stats(logits, labels, sample_weight)


@functools.partial(jax.jit, static_argnames=("apply_fn", "has_batch_stats"))
def eval_forward(apply_fn, params, batch_stats, images, has_batch_stats=True):
    variables = {"params": params}
    if has_batch_stats:
        variables["batch_stats"] = batch_stats
    return apply_fn(variables, images, train=False)


class Predictor:
    """Callable predictor that also exposes (apply_fn, params, batch_stats)
    so the sliding-window inferer can jit its whole pipeline ONCE with the
    parameters as traced arguments (no retrace when weights change).

    `cast_dtype` (e.g. jnp.bfloat16) runs the forward in reduced precision:
    float params/stats and the input windows are cast on the way in and the
    logits are cast back to f32 on the way out. Geometry-critical math
    (deform coordinates, interpolation-weight construction) stays f32 inside
    the model regardless (see `mm_unet.MMConv`/`_TapConv`, `ops.grid_sample`),
    so only feature/weight tensors lose precision — the MXU-native path.
    """

    def __init__(self, apply_fn, params, batch_stats, has_bs: bool,
                 cast_dtype=None):
        if cast_dtype is not None:
            cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda p: p.astype(cast_dtype)
                if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating)
                else p,
                t,
            )
            params, batch_stats = cast(params), cast(batch_stats)
        self.apply_fn = apply_fn
        self.params = params
        self.batch_stats = batch_stats
        self.has_bs = has_bs
        self.cast_dtype = cast_dtype

    def __call__(self, windows):
        if self.cast_dtype is not None:
            windows = windows.astype(self.cast_dtype)
        out = eval_forward(
            self.apply_fn, self.params, self.batch_stats, windows,
            has_batch_stats=self.has_bs,
        )
        return out.astype(jnp.float32) if self.cast_dtype is not None else out


def make_predictor(state: TrainState, dtype=None):
    """dtype=jnp.bfloat16 -> reduced-precision inference (see Predictor)."""
    has_bs = bool(jax.tree_util.tree_leaves(state.batch_stats))
    return Predictor(state.apply_fn, state.params, state.batch_stats, has_bs,
                     cast_dtype=dtype)
