"""Bilinear grid sampling with PyTorch `grid_sample` semantics
(mode='bilinear', padding_mode='zeros', align_corners=True) — the exact
configuration MMConv's deformable sampling uses
(`/root/reference/src/UM_Net/MMUNet.py:218-224`).

Gather-based: four `take_along_axis` gathers over the flattened H*W axis with
out-of-bounds neighbours masked to zero. align_corners=True maps grid value
-1 -> 0 and +1 -> size-1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_sample_bilinear(feat: Array, grid: Array) -> Array:
    """feat: (B, C, H, W); grid: (B, Hg, Wg, 2) with grid[..., 0]=x, [..., 1]=y
    in [-1, 1]. Returns (B, C, Hg, Wg)."""
    b, c, h, w = feat.shape
    _, hg, wg, _ = grid.shape
    gf = grid.astype(jnp.float32)
    x = (gf[..., 0] + 1.0) * 0.5 * (w - 1)  # (B, Hg, Wg)
    y = (gf[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yi_c * w + xi_c).reshape(b, 1, hg * wg)
        vals = jnp.take_along_axis(
            feat.reshape(b, c, h * w), idx, axis=2
        ).reshape(b, c, hg, wg)
        return vals * valid.astype(feat.dtype)[:, None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    wx = wx.astype(feat.dtype)[:, None]
    wy = wy.astype(feat.dtype)[:, None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
