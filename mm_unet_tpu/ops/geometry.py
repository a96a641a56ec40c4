"""MMConv geometry: serpentine (two-row column-interleaved) flatten and the
kernel-offset accumulation used by the deformable coordinate maps.

Reference: `/root/reference/src/UM_Net/MMUNet.py:68-193`. The reference's
sequential "offset is an iterative process" Python loop (`:162-171`) is a
cumulative sum outward from the kernel centre; here it is two `cumsum`s —
compiler-friendly, no per-step loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def two_row_columnwise_flatten(x: Array) -> Array:
    """(B, C, H, W) -> (B, C, H*W): pairs of rows interleaved column-wise
    (row0[0], row1[0], row0[1], row1[1], ...), odd trailing row appended
    row-major (reference `two_row_columnwise_flatten_grad_safe`,
    `MMUNet.py:68-93`)."""
    b, c, h, w = x.shape
    even = h // 2 * 2
    main = x[:, :, :even].reshape(b, c, even // 2, 2, w)
    main = main.transpose(0, 1, 2, 4, 3).reshape(b, c, even * w)
    if h % 2 == 1:
        tail = x[:, :, even:].reshape(b, c, w)
        main = jnp.concatenate([main, tail], axis=2)
    return main


def inverse_two_row_columnwise_flatten(x_flat: Array, h: int, w: int) -> Array:
    """Inverse of `two_row_columnwise_flatten` (reference `MMUNet.py:95-121`)."""
    b, c, _ = x_flat.shape
    even = h // 2 * 2
    main = x_flat[:, :, : even * w].reshape(b, c, even // 2, w, 2)
    main = main.transpose(0, 1, 2, 4, 3).reshape(b, c, even, w)
    if h % 2 == 1:
        tail = x_flat[:, :, even * w :].reshape(b, c, 1, w)
        main = jnp.concatenate([main, tail], axis=2)
    return main


def accumulate_offsets_from_center(y_offset: Array) -> Array:
    """Cumulative offsets outward from the kernel centre along axis 1.

    y_offset: (B, K, H, W). Returns same shape with
      out[center] = 0,
      out[center+i] = sum_{j=1..i} y_offset[center+j],
      out[center-i] = sum_{j=1..i} y_offset[center-j]
    — the closed form of the reference's iterative loop (`MMUNet.py:159-171`).
    """
    k = y_offset.shape[1]
    center = k // 2
    upper = jnp.cumsum(y_offset[:, center + 1 :], axis=1)
    # suffix sums of the sub-centre block: out[m] = sum_{idx=m..center-1} off[idx]
    low = y_offset[:, :center]
    lower = jnp.flip(jnp.cumsum(jnp.flip(low, axis=1), axis=1), axis=1)
    zero = jnp.zeros_like(y_offset[:, :1])
    return jnp.concatenate([lower, zero, upper], axis=1)


def two_row_flatten_tokens(x: Array) -> Array:
    """NHWC variant producing token sequences directly:
    (B, H, W, C) -> (B, H*W, C) in serpentine two-row order."""
    b, h, w, c = x.shape
    even = h // 2 * 2
    main = x[:, :even].reshape(b, even // 2, 2, w, c)
    main = main.transpose(0, 1, 3, 2, 4).reshape(b, even * w, c)
    if h % 2 == 1:
        main = jnp.concatenate([main, x[:, even:].reshape(b, w, c)], axis=1)
    return main


def inverse_two_row_flatten_tokens(tokens: Array, h: int, w: int) -> Array:
    """Inverse of `two_row_flatten_tokens`: (B, H*W, C) -> (B, H, W, C)."""
    b, _, c = tokens.shape
    even = h // 2 * 2
    main = tokens[:, : even * w].reshape(b, even // 2, w, 2, c)
    main = main.transpose(0, 1, 3, 2, 4).reshape(b, even, w, c)
    if h % 2 == 1:
        main = jnp.concatenate([main, tokens[:, even * w :].reshape(b, 1, w, c)], axis=1)
    return main


def accumulate_offsets_from_center_last(y_offset: Array) -> Array:
    """`accumulate_offsets_from_center` along the LAST axis (NHWC kernel-tap
    axis): (..., K) -> (..., K)."""
    k = y_offset.shape[-1]
    center = k // 2
    upper = jnp.cumsum(y_offset[..., center + 1 :], axis=-1)
    low = y_offset[..., :center]
    lower = jnp.flip(jnp.cumsum(jnp.flip(low, axis=-1), axis=-1), axis=-1)
    zero = jnp.zeros_like(y_offset[..., :1])
    return jnp.concatenate([lower, zero, upper], axis=-1)
