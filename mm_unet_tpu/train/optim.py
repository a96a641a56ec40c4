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


def build_optimizer(
    params,
    opt: str = "adamw",
    lr=1e-3,
    weight_decay: float = 0.05,
    betas: tuple[float, float] = (0.9, 0.95),
    clip_norm: float | None = None,
) -> optax.GradientTransformation:
    """AdamW with decoupled weight decay masked like timm's param-group
    filtering. `lr` may be a float or an optax schedule."""
    if opt.lower() != "adamw":
        raise NotImplementedError(f"optimizer {opt!r}")
    tx = optax.adamw(
        lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay, mask=wd_mask(params)
    )
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx
