"""Parity of the fused single-vector AdamW (`optim.flat_adamw`) against the
per-leaf `optax.adamw` it replaces: identical updates and states over multiple
steps, with the timm-style weight-decay mask and an lr schedule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mm_unet_tpu.train.optim import (
    build_optimizer,
    warmup_cosine_epoch_schedule,
    wd_mask,
)


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    return {
        # big_kernel/big_nodecay exceed flat_adamw's big_leaf_elems=4096,
        # so the hybrid per-leaf path (decayed AND no-decay flavors) is
        # exercised alongside the small-leaf flat vector
        "conv": {"kernel": f(3, 3, 4, 8), "bias": f(8),
                 "big_kernel": f(3, 3, 32, 32)},
        "bn": {"scale": f(8), "bias": f(8)},
        "mamba": {"A_log": f(16, 4), "D": f(16), "x_proj_weight": f(9, 16),
                  "big_nodecay_bias": f(8192)},
        "altho": f(),
    }


def test_flat_adamw_matches_optax():
    params = _tree(0)
    sched = warmup_cosine_epoch_schedule(1e-3, 2, 50, steps_per_epoch=3)
    flat_tx = build_optimizer(params, lr=sched, weight_decay=0.05, flat=True)
    ref_tx = build_optimizer(params, lr=sched, weight_decay=0.05, flat=False)

    fs, rs = flat_tx.init(params), ref_tx.init(params)
    p_f, p_r = params, params
    for step in range(7):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                np.random.default_rng(100 + step).standard_normal(p.shape), jnp.float32
            ),
            params,
        )
        uf, fs = flat_tx.update(grads, fs, p_f)
        ur, rs = ref_tx.update(grads, rs, p_r)
        p_f = optax.apply_updates(p_f, uf)
        p_r = optax.apply_updates(p_r, ur)
    for kp, a in jax.tree_util.tree_leaves_with_path(p_f):
        b = p_r
        for k in kp:
            b = b[k.key if hasattr(k, "key") else k]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=f"param {kp}",
        )


def test_flat_adamw_wd_mask_semantics():
    """No-decay leaves (biases, norms, A_log/D/altho) stay decay-free: with
    zero gradients, masked params must not shrink while masked-in ones do."""
    params = _tree(1)
    tx = build_optimizer(params, lr=1e-2, weight_decay=0.5, flat=True)
    st = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, st = tx.update(zeros, st, params)
    mask = wd_mask(params)
    for (kp, u), (_, m), (_, p) in zip(
        jax.tree_util.tree_leaves_with_path(upd),
        jax.tree_util.tree_leaves_with_path(mask),
        jax.tree_util.tree_leaves_with_path(params),
    ):
        if m:
            assert float(jnp.max(jnp.abs(u))) > 0, f"decay missing on {kp}"
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(-1e-2 * 0.5 * p), rtol=1e-6,
                err_msg=f"decay value {kp}",
            )
        else:
            np.testing.assert_allclose(
                np.asarray(u), 0.0, atol=0, err_msg=f"unexpected decay on {kp}"
            )


def test_flat_adamw_clip_norm():
    """Global-norm clipping matches optax.clip_by_global_norm + adamw."""
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": 10.0 * jnp.ones((4, 4)), "b": 5.0 * jnp.ones((4,))}
    flat_tx = build_optimizer(params, lr=1e-3, weight_decay=0.0,
                              clip_norm=1.0, flat=True)
    ref_tx = build_optimizer(params, lr=1e-3, weight_decay=0.0,
                             clip_norm=1.0, flat=False)
    uf, _ = flat_tx.update(grads, flat_tx.init(params), params)
    ur, _ = ref_tx.update(grads, ref_tx.init(params), params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(uf[k]), np.asarray(ur[k]), rtol=1e-6, atol=1e-8
        )
