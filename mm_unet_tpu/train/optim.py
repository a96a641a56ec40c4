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
    big_leaf_elems: int = 4096,
) -> optax.GradientTransformation:
    """AdamW fused over ONE raveled vector for the small parameter leaves,
    per-leaf for the big ones — numerically identical to
    `optax.adamw(..., mask=mask_tree)`.

    Why hybrid: a model with hundreds of parameter leaves lowers to hundreds
    of tiny dispatch-bound per-leaf fusions (~10 ms/step measured round 2) —
    the flat vector fixes that. But ravel/unravel of the BIG leaves makes
    XLA relayout the whole vector between its 1-D T(1024) tiling and the
    leaves' 2-D T(8,128) tilings, which profiled at ~15 ms/step on MM_Net
    (round 5, `%reshape.60659` family). Leaves with >= `big_leaf_elems`
    elements (~3% of the leaf count, ~95% of the bytes) therefore update
    per-leaf — real-sized kernels, no relayout — and only the small-leaf
    tail rides the flat vector.

    State: {count, m, v, wd, bm, bv} — m/v/wd flat f32 vectors over the
    small leaves (`wd` is the weight-decay mask baked at init from
    `mask_tree`, see `wd_mask`); bm/bv are per-big-leaf moment dicts keyed
    by flattened path (the big leaves' static 0/1 decay factors live in the
    closure, not the state).

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

    def _path_key(path) -> str:
        return "/".join(
            str(getattr(e, "key", getattr(e, "idx", e))) for e in path
        )

    def _is_big(leaf) -> bool:
        return getattr(leaf, "size", 0) >= big_leaf_elems

    def _small_tree(tree):
        """Big leaves replaced by 0-length arrays: same pytree structure,
        so ravel/unravel skip their bytes entirely."""
        return jax.tree_util.tree_map(
            lambda x: jnp.zeros((0,), x.dtype) if _is_big(x) else x, tree
        )

    def _big_dict(tree):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            if _is_big(leaf):
                out[_path_key(path)] = leaf
        return out

    def init(params):
        flat, _ = ravel_pytree(_small_tree(params))
        mt = mask_tree if mask_tree is not None else wd_mask(params)
        wd_vec, _ = ravel_pytree(
            _small_tree(
                jax.tree_util.tree_map(
                    lambda p, m: jnp.full(p.shape, float(m), p.dtype), params, mt
                )
            )
        )
        bigs = _big_dict(params)
        return {
            "count": jnp.zeros((), jnp.int32),
            "m": jnp.zeros_like(_pad(flat)),
            "v": jnp.zeros_like(_pad(flat)),
            "wd": _pad(wd_vec),
            "bm": {k: jnp.zeros_like(v) for k, v in bigs.items()},
            "bv": {k: jnp.zeros_like(v) for k, v in bigs.items()},
        }

    def update(grads, state, params):
        mt = mask_tree if mask_tree is not None else wd_mask(params)
        # static per-big-leaf decay flags from the mask tree (python bools)
        big_wd = {}
        for (path, leaf), (_, flag) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(mt)[0],
        ):
            if _is_big(leaf):
                big_wd[_path_key(path)] = float(flag)

        g, unravel = ravel_pytree(_small_tree(grads))
        p, _ = ravel_pytree(_small_tree(params))
        gb = _big_dict(grads)
        pb = _big_dict(params)
        n = g.shape[0]
        if clip_norm is not None:
            gsq = jnp.sum(g * g) + sum(jnp.sum(x * x) for x in gb.values())
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(jnp.sqrt(gsq), 1e-12))
            g = g * scale
            gb = {k: x * scale for k, x in gb.items()}
        g, p = _pad(g), _pad(p)
        count = state["count"] + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c
        # optax's scale_by_schedule evaluates the schedule at the PRE-increment
        # count (first update sees lr(0)) — match it exactly
        step_lr = _lr(state["count"])

        m = b1 * state["m"] + (1.0 - b1) * g
        v = b2 * state["v"] + (1.0 - b2) * (g * g)
        u = (m / bc1) / (jnp.sqrt(v / bc2) + eps) + weight_decay * state["wd"] * p
        u_small = unravel((-step_lr * u)[:n])

        bm, bv, bu = {}, {}, {}
        for k in gb:
            bm[k] = b1 * state["bm"][k] + (1.0 - b1) * gb[k]
            bv[k] = b2 * state["bv"][k] + (1.0 - b2) * (gb[k] * gb[k])
            uu = (bm[k] / bc1) / (jnp.sqrt(bv[k] / bc2) + eps)
            if big_wd[k]:
                uu = uu + weight_decay * pb[k]
            bu[k] = -step_lr * uu

        def merge(path, p_leaf, u_leaf):
            key = _path_key(path)
            return bu[key] if key in bu else u_leaf

        updates = jax.tree_util.tree_map_with_path(merge, params, u_small)
        return updates, {"count": count, "m": m, "v": v, "wd": state["wd"],
                         "bm": bm, "bv": bv}

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
