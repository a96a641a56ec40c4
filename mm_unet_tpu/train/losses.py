"""Segmentation losses — MONAI-semantics clones (jitted JAX).

The reference trains with `DiceFocalLoss(smooth_nr=0, smooth_dr=1e-5,
sigmoid=True)` at weight 1.0 (`/root/reference/train.py:230-236`); the
alternative Tversky/Focal/GeneralizedDice combo it ships commented-out
(`train.py:205-228`) and the standalone `DICE_BCE_Loss` (`loss.py`) are also
provided. All take NCHW `logits` and binary/one-hot `targets` of the same
shape and return a scalar (mean reduction), matching MONAI defaults.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _bce_with_logits(logits: Array, targets: Array) -> Array:
    """Elementwise binary cross entropy with logits (stable form)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _wmean(per_sample: Array, weight: Array | None) -> Array:
    """Mean of per-sample values (B, ...) — sample-weighted when `weight`
    (B,) is given (pad rows from `shard_batch` carry weight 0)."""
    if per_sample.ndim > 1:
        per_sample = jnp.mean(per_sample, axis=tuple(range(1, per_sample.ndim)))
    if weight is None:
        return jnp.mean(per_sample)
    w = weight.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def dice_loss(
    logits: Array,
    targets: Array,
    sigmoid: bool = True,
    smooth_nr: float = 0.0,
    smooth_dr: float = 1e-5,
    squared_pred: bool = False,
    weight: Array | None = None,
) -> Array:
    """MONAI DiceLoss: per-(sample, channel) dice over spatial dims, mean."""
    p = jax.nn.sigmoid(logits) if sigmoid else logits
    t = targets.astype(p.dtype)
    dims = tuple(range(2, p.ndim))
    inter = jnp.sum(p * t, axis=dims)
    if squared_pred:
        denom = jnp.sum(p * p, axis=dims) + jnp.sum(t * t, axis=dims)
    else:
        denom = jnp.sum(p, axis=dims) + jnp.sum(t, axis=dims)
    dice = 1.0 - (2.0 * inter + smooth_nr) / (denom + smooth_dr)
    return _wmean(dice, weight)


def focal_loss(logits: Array, targets: Array, gamma: float = 2.0, alpha=None,
               weight: Array | None = None) -> Array:
    """MONAI FocalLoss (sigmoid form): mean over all elements of
    BCE * (1 - p_t)^gamma."""
    t = targets.astype(logits.dtype)
    ce = _bce_with_logits(logits, t)
    p = jax.nn.sigmoid(logits)
    p_t = p * t + (1 - p) * (1 - t)
    loss = ce * (1 - p_t) ** gamma
    if alpha is not None:
        loss = loss * (alpha * t + (1 - alpha) * (1 - t))
    return _wmean(loss, weight)


def dice_focal_loss(
    logits: Array,
    targets: Array,
    smooth_nr: float = 0.0,
    smooth_dr: float = 1e-5,
    gamma: float = 2.0,
    lambda_dice: float = 1.0,
    lambda_focal: float = 1.0,
    weight: Array | None = None,
) -> Array:
    """The reference's training loss (`train.py:230-236`)."""
    return lambda_dice * dice_loss(
        logits, targets, sigmoid=True, smooth_nr=smooth_nr, smooth_dr=smooth_dr,
        weight=weight,
    ) + lambda_focal * focal_loss(logits, targets, gamma=gamma, weight=weight)


def tversky_loss(
    logits: Array, targets: Array, alpha: float = 0.7, beta: float = 0.3,
    smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
    weight: Array | None = None,
) -> Array:
    """MONAI TverskyLoss (sigmoid)."""
    p = jax.nn.sigmoid(logits)
    t = targets.astype(p.dtype)
    dims = tuple(range(2, p.ndim))
    tp = jnp.sum(p * t, axis=dims)
    fp = jnp.sum(p * (1 - t), axis=dims)
    fn = jnp.sum((1 - p) * t, axis=dims)
    score = (tp + smooth_nr) / (tp + alpha * fn + beta * fp + smooth_dr)
    return _wmean(1.0 - score, weight)


def generalized_dice_loss(
    logits: Array, targets: Array, w_type: str = "square",
    smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
    weight: Array | None = None,
) -> Array:
    """MONAI GeneralizedDiceLoss (sigmoid, per-sample class weighting)."""
    p = jax.nn.sigmoid(logits)
    t = targets.astype(p.dtype)
    dims = tuple(range(2, p.ndim))
    ground = jnp.sum(t, axis=dims)
    if w_type == "square":
        w = 1.0 / jnp.maximum(ground * ground, 1e-10)
    elif w_type == "simple":
        w = 1.0 / jnp.maximum(ground, 1e-10)
    else:
        w = jnp.ones_like(ground)
    w = jnp.where(jnp.isfinite(w), w, jnp.max(jnp.where(jnp.isfinite(w), w, 0.0)))
    inter = jnp.sum(p * t, axis=dims)
    denom = jnp.sum(p, axis=dims) + ground
    numer = 2.0 * jnp.sum(w * inter, axis=-1) + smooth_nr
    denom = jnp.sum(w * denom, axis=-1) + smooth_dr
    return _wmean(1.0 - numer / denom, weight)


def dice_bce_loss(logits: Array, targets: Array, smooth: float = 1e-5,
                  weight: Array | None = None) -> Array:
    """Standalone DICE+BCE of the reference's mini pipeline (`loss.py`)."""
    t = targets.astype(logits.dtype)
    bce = _wmean(_bce_with_logits(logits, t), weight)
    p = jax.nn.sigmoid(logits)
    if weight is not None:
        wb = weight.astype(p.dtype).reshape((-1,) + (1,) * (p.ndim - 1))
        p, t = p * wb, t * wb
    inter = jnp.sum(p * t)
    dice = 1 - (2 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)
    return bce + dice


LOSS_REGISTRY = {
    "dice_focal_loss": dice_focal_loss,
    "dice_loss": dice_loss,
    "focal_loss": focal_loss,
    "focal_tversky": tversky_loss,
    "generalized_dice": generalized_dice_loss,
    "dice_bce": dice_bce_loss,
}
