"""Shared model building blocks (NHWC, TPU-native layouts).

All models keep activations in NHWC internally (TPU conv layout) and expose
the reference's NCHW interface at the model boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _resize_matrix_align_corners(n: int, m: int) -> np.ndarray:
    """(m, n) bilinear interpolation matrix, align_corners=True semantics
    (torch `F.interpolate(..., mode='bilinear', align_corners=True)`)."""
    if n == 1:
        return np.ones((m, 1), np.float32)
    if m == 1:
        w = np.zeros((1, n), np.float32)
        w[0, 0] = 1.0
        return w
    pos = np.arange(m, dtype=np.float64) * (n - 1) / (m - 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n - 1)
    hi = np.minimum(lo + 1, n - 1)
    frac = (pos - lo).astype(np.float32)
    w = np.zeros((m, n), np.float32)
    w[np.arange(m), lo] += 1.0 - frac
    w[np.arange(m), hi] += frac
    return w


def _resize_matrix_half_pixel(n: int, m: int) -> "np.ndarray":
    """Row-interp matrix for torch F.interpolate(mode='bilinear',
    align_corners=False) WITHOUT antialiasing: src = (dst + 0.5) * n/m - 0.5,
    edge-clamped, triangle kernel of width 1 regardless of scale (unlike
    jax.image.resize, which widens the kernel when downsampling)."""
    pos = np.clip((np.arange(m, dtype=np.float64) + 0.5) * (n / m) - 0.5, 0, n - 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n - 1)
    hi = np.minimum(lo + 1, n - 1)
    frac = (pos - lo).astype(np.float32)
    w = np.zeros((m, n), np.float32)
    w[np.arange(m), lo] += 1.0 - frac
    w[np.arange(m), hi] += frac
    return w


def resize_bilinear_torch(x: Array, out_hw: tuple[int, int]) -> Array:
    """NHWC bilinear resize matching torch F.interpolate(align_corners=False)
    exactly, up- or downsampling (no antialias), as two small matmuls."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    mh = jnp.asarray(_resize_matrix_half_pixel(h, oh))
    mw = jnp.asarray(_resize_matrix_half_pixel(w, ow))
    x = jnp.einsum("bhwc,ph->bpwc", x, mh.astype(x.dtype))
    return jnp.einsum("bhwc,qw->bhqc", x, mw.astype(x.dtype))


def resize_bilinear_align_corners(x: Array, out_hw: tuple[int, int]) -> Array:
    """NHWC bilinear resize with align_corners=True, as two small matmuls
    (MXU-friendly; no gathers)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    mh = jnp.asarray(_resize_matrix_align_corners(h, oh))
    mw = jnp.asarray(_resize_matrix_align_corners(w, ow))
    x = jnp.einsum("bhwc,ph->bpwc", x, mh.astype(x.dtype))
    return jnp.einsum("bhwc,qw->bhqc", x, mw.astype(x.dtype))


def grid_sample_bilinear_nhwc(feat: Array, grid: Array) -> Array:
    """NHWC variant of torch-parity grid_sample (bilinear, zeros padding,
    align_corners=True). feat: (B, H, W, C); grid: (B, Hg, Wg, 2) xy in
    [-1, 1]. Returns (B, Hg, Wg, C)."""
    import os

    b, h, w, c = feat.shape
    _, hg, wg, _ = grid.shape
    if os.environ.get("MMU_GRIDSAMPLE") == "bypass" and hg % h == 0 and wg == w:
        # profiling ablation: replicate rows instead of sampling
        return jnp.repeat(feat, hg // h, axis=1)
    gf = grid.astype(jnp.float32)
    x = (gf[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (gf[..., 1] + 1.0) * 0.5 * (h - 1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx, wy = x - x0, y - y0
    flat = feat.reshape(b, h * w, c)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = (
            jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        ).reshape(b, hg * wg, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1).reshape(b, hg, wg, c)
        return vals * valid.astype(feat.dtype)[..., None]

    v00, v01 = gather(y0, x0), gather(y0, x0 + 1)
    v10, v11 = gather(y0 + 1, x0), gather(y0 + 1, x0 + 1)
    wx = wx.astype(feat.dtype)[..., None]
    wy = wy.astype(feat.dtype)[..., None]
    return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy


class ConvBNRelu(nn.Module):
    """Conv -> BatchNorm -> ReLU (the reference's ubiquitous trio)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2  # torch pad=k//2 (SAME pads (0,1) at stride 2)
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=((p, p), (p, p)), use_bias=self.use_bias,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


def nchw_to_nhwc(x: Array) -> Array:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: Array) -> Array:
    return jnp.transpose(x, (0, 3, 1, 2))


def _shift_cols_clamped(feat: Array, dx: int) -> Array:
    """Static column shift with edge clamping: out[..., j, :] =
    feat[..., clip(j + dx, 0, W-1), :]. Matches the reference coordinate
    clamp (`DSC_conv.py:269`) even when |dx| >= W (deep stages of small
    inputs, where every shifted column lands on the boundary pixel)."""
    w = feat.shape[2]
    if dx == 0:
        return feat
    if dx > 0:
        return jnp.concatenate(
            [feat[:, :, dx:], jnp.repeat(feat[:, :, -1:], min(dx, w), axis=2)],
            axis=2,
        )
    return jnp.concatenate(
        [jnp.repeat(feat[:, :, :1], min(-dx, w), axis=2), feat[:, :, : max(w + dx, 0)]],
        axis=2,
    )


def deform_sample_rows(feat: Array, y_coords: Array, x_shifts) -> Array:
    """Specialised MMConv/DSConv morph-0 deformable sampling.

    The reference's coordinate maps clamp x to integer column positions
    (`MMUNet.py:145,237`: x = col + linspace(-c, c, k), then clamp), so
    bilinear sampling degenerates to an edge-clamped column shift per kernel
    tap plus a 1-D interpolation along rows. This does 2 gathers per tap on
    (B, H, W, C) instead of 4 gathers on (B, H*K, W, C) — half the
    gather/scatter volume of generic grid_sample, with identical results for
    integer x.

    feat: (B, H, W, C); y_coords: (B, H, W, K) absolute row coordinates
    (pre-clamp); x_shifts: K static ints (tap offsets j - center).
    Returns (B, H*K, W, C), taps consecutive per row.
    """
    b, h, w, c = feat.shape
    k = y_coords.shape[-1]
    y = jnp.clip(y_coords, 0, h - 1)
    y0 = jnp.floor(y)
    wy = (y - y0).astype(feat.dtype)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)

    taps = []
    for j, dx in enumerate(x_shifts):
        xs = _shift_cols_clamped(feat, dx)
        v0 = jnp.take_along_axis(xs, y0i[..., j : j + 1], axis=1)
        v1 = jnp.take_along_axis(xs, y1i[..., j : j + 1], axis=1)
        taps.append(v0 * (1 - wy[..., j : j + 1]) + v1 * wy[..., j : j + 1])
    out = jnp.stack(taps, axis=2)  # (B, H, K, W, C)
    return out.reshape(b, h * k, w, c)


def deform_sample_rows_gather(feat: Array, y_coords: Array, x_shifts) -> Array:
    """Single-gather variant of `deform_sample_rows`: one lax.gather of
    (2-row, C) windows per (position, tap), with the integer column shift
    folded into the gather indices — no shifted feature copies, half the
    gather count. Exactly equivalent for h >= 2."""
    b, h, w, c = feat.shape
    k = len(x_shifts)
    if h < 2:
        return deform_sample_rows(feat, y_coords, x_shifts)
    yc = jnp.clip(y_coords, 0, h - 1)
    y0 = jnp.minimum(jnp.floor(yc), h - 2)
    wy = (yc - y0).astype(feat.dtype)
    y0i = y0.astype(jnp.int32)  # (B, H, W, K)

    xw = jnp.clip(
        jnp.arange(w, dtype=jnp.int32)[None, None, :, None]
        + jnp.asarray(x_shifts, jnp.int32)[None, None, None, :],
        0, w - 1,
    )
    xw = jnp.broadcast_to(xw, y0i.shape)
    bidx = jax.lax.broadcasted_iota(jnp.int32, y0i.shape, 0)
    idx = jnp.stack([bidx, y0i, xw], axis=-1).reshape(-1, 3)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(0, 2),
        start_index_map=(0, 1, 2),
    )
    out = jax.lax.gather(
        feat, idx, dn, slice_sizes=(1, 2, 1, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(b, h, w, k, 2, c)
    v = out[..., 0, :] * (1 - wy[..., None]) + out[..., 1, :] * wy[..., None]
    return v.transpose(0, 1, 3, 2, 4).reshape(b, h * k, w, c)


def deform_sample_rows_matmul(feat: Array, y_coords: Array, x_shifts) -> Array:
    """Gather-free morph-0 deformable sampling: the row interpolation is a
    batched (H_out x H_src) @ (H_src x C) matmul with a 2-hot bilinear weight
    matrix built by broadcasted comparison — runs on the MXU, and its
    backward is another matmul (no scatter). The TPU-native replacement for
    grid_sample's gathers on the hot path.

    feat: (B, H, W, C); y_coords: (B, H, W, K); x_shifts: K static ints.
    Returns (B, H*K, W, C), taps consecutive per row.
    """
    b, h, w, c = feat.shape
    k = y_coords.shape[-1]
    yc = jnp.clip(y_coords, 0, h - 1).astype(feat.dtype)
    src = jnp.arange(h, dtype=feat.dtype)  # source row ids
    # bilinear hat: M[..., s] = max(0, 1 - |s - y|) — 2-hot with the exact
    # bilinear weights (and the correct subgradient wrt y), built in one pass
    m = jnp.maximum(0.0, 1.0 - jnp.abs(src[None, None, None, None, :] - yc[..., None]))

    taps = []
    for j, dx in enumerate(x_shifts):
        xs = _shift_cols_clamped(feat, dx)
        # contract source rows on the MXU: (B,W,H_out,S) @ (B,W,S,C)
        taps.append(jnp.einsum("bhws,bswc->bhwc", m[:, :, :, j], xs))
    out = jnp.stack(taps, axis=2)  # (B, H, K, W, C)
    return out.reshape(b, h * k, w, c)


def deform_sample(feat: Array, y_coords: Array, x_shifts) -> Array:
    """Morph-0 deformable sampling with automatic strategy selection:
    MXU 2-hot matmul for moderate row counts (no gathers at all), gather
    fallback for very tall feature maps where the (H_out x H_src) weight
    tensor would dominate memory."""
    h = feat.shape[1]
    if h <= 256:
        return deform_sample_rows_matmul(feat, y_coords, x_shifts)
    return deform_sample_rows(feat, y_coords, x_shifts)
