"""Optimizer + LR schedule (TPU-native optax).

Clones the reference setup: timm `create_optimizer_v2(opt='adamw',
weight_decay=0.05, lr=1e-3, betas=(0.9, 0.95))` with bias/norm/no-decay
filtering (`/root/reference/train.py:197-199`) and the closed-form
`LinearWarmupCosineAnnealingLR` stepped per-epoch
(`/root/reference/src/optimizer.py:84-100`) — expressed as an optax step
schedule (`epoch = step // steps_per_epoch`), so the whole update stays
inside one jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

# parameter-name suffixes that never get weight decay: 1-D params (biases,
# norm scales) and the Mamba no-weight-decay set (A*_log, D*) — reference
# `mamba_simple.py:108,118,122` `_no_weight_decay` / timm filter_bias_and_bn.
_NO_DECAY_NAMES = ("A_log", "A_b_log", "A_s_log", "D", "D_b", "D_s", "altho")


def wd_mask(params):
    """Pytree mask: True where weight decay applies."""

    def mask_fn(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in _NO_DECAY_NAMES or name.endswith("_bias") or name == "bias":
            return False
        if leaf.ndim <= 1:
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def warmup_cosine_epoch_schedule(
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    steps_per_epoch: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
):
    """optax schedule: closed-form LinearWarmupCosineAnnealing evaluated at
    epoch granularity (the reference calls `scheduler.step(epoch)`)."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // steps_per_epoch
        if warmup_epochs > 1:
            warm = warmup_start_lr + epoch * (base_lr - warmup_start_lr) / (warmup_epochs - 1)
        else:
            warm = jnp.asarray(base_lr, jnp.float32)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * (epoch - warmup_epochs) / max(max_epochs - warmup_epochs, 1))
        )
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def flat_adamw(
    lr,
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
    weight_decay: float = 0.05,
    mask_tree=None,
    clip_norm: float | None = None,
    pad_to: int = 256,
) -> optax.GradientTransformation:
    """AdamW over ONE raveled parameter vector — numerically identical to
    `optax.adamw(..., mask=mask_tree)` but fused: a model with hundreds of
    parameter leaves otherwise lowers to hundreds of tiny per-leaf XLA
    fusions (measured ~10 ms/step of dispatch-bound f32[64]-sized kernels in
    the MM_Net train step); on the flat vector the whole update is a handful
    of large elementwise ops.

    State: (count, m, v, wd) with m/v/wd flat f32 vectors; `wd` is the
    weight-decay mask baked at init from `mask_tree` (see `wd_mask`).

    The vectors are zero-padded to a multiple of `pad_to` (default 256) so
    ZeRO-1 can lay them out P("data") over any mesh axis up to that size
    (jax.device_put requires even shards); a FIXED multiple — rather than
    the live device count — keeps the optimizer-state checkpoint layout
    identical across topologies. Pad lanes see g=0/p=0 and stay exactly 0.
    """
    from jax.flatten_util import ravel_pytree

    def _lr(count):
        return lr(count) if callable(lr) else jnp.asarray(lr, jnp.float32)

    def _pad(vec):
        return jnp.pad(vec, (0, (-vec.shape[0]) % pad_to))

    def init(params):
        flat, _ = ravel_pytree(params)
        mt = mask_tree if mask_tree is not None else wd_mask(params)
        wd_vec, _ = ravel_pytree(
            jax.tree_util.tree_map(
                lambda p, m: jnp.full(p.shape, float(m), p.dtype), params, mt
            )
        )
        return {
            "count": jnp.zeros((), jnp.int32),
            "m": jnp.zeros_like(_pad(flat)),
            "v": jnp.zeros_like(_pad(flat)),
            "wd": _pad(wd_vec),
        }

    def update(grads, state, params):
        g, unravel = ravel_pytree(grads)
        p, _ = ravel_pytree(params)
        n = g.shape[0]
        if clip_norm is not None:
            gn = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.minimum(1.0, clip_norm / jnp.maximum(gn, 1e-12))
        g, p = _pad(g), _pad(p)
        count = state["count"] + 1
        m = b1 * state["m"] + (1.0 - b1) * g
        v = b2 * state["v"] + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mhat = m / (1.0 - b1**c)
        vhat = v / (1.0 - b2**c)
        u = mhat / (jnp.sqrt(vhat) + eps) + weight_decay * state["wd"] * p
        # optax's scale_by_schedule evaluates the schedule at the PRE-increment
        # count (first update sees lr(0)) — match it exactly
        u = -_lr(state["count"]) * u
        return unravel(u[:n]), {"count": count, "m": m, "v": v, "wd": state["wd"]}

    return optax.GradientTransformation(init, update)


def build_optimizer(
    params,
    opt: str = "adamw",
    lr=1e-3,
    weight_decay: float = 0.05,
    betas: tuple[float, float] = (0.9, 0.95),
    clip_norm: float | None = None,
    flat: bool = True,
) -> optax.GradientTransformation:
    """AdamW with decoupled weight decay masked like timm's param-group
    filtering. `lr` may be a float or an optax schedule. `flat=True` (default)
    uses the fused single-vector implementation (`flat_adamw`, update-parity
    tested against optax in tests/test_optim.py); `flat=False` keeps the
    per-leaf optax transformation."""
    if opt.lower() != "adamw":
        raise NotImplementedError(f"optimizer {opt!r}")
    if flat:
        return flat_adamw(
            lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay,
            mask_tree=wd_mask(params), clip_norm=clip_norm,
        )
    tx = optax.adamw(
        lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay, mask=wd_mask(params)
    )
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx
