"""Standalone DICE+BCE loss — parity with the reference's top-level `loss.py`
(28 LoC, unused by the main trainer)."""

import jax.numpy as jnp

from mm_unet_tpu.train.losses import dice_bce_loss as DICE_BCE_Loss  # noqa: N812


def dice_coeff(pred, target, smooth: float = 1e-5):
    inter = jnp.sum(pred * target)
    return (2.0 * inter + smooth) / (jnp.sum(pred) + jnp.sum(target) + smooth)
