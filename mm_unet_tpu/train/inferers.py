"""Sliding-window inference — MONAI `SlidingWindowInferer` semantics
(roi_size, overlap=0.5, constant blending), reference usage
`/root/reference/train.py:180-181,90`.

TPU-first: window starts are static Python ints (shapes are static under
jit), windows are batched through the model in fixed-size groups via
`lax.map`, the count canvas is a trace-time numpy constant, and — when the
predictor exposes its parameters (`trainer.Predictor`) — the WHOLE pipeline
(window extraction -> grouped forward -> stitch) compiles as ONE program
with the weights as traced arguments, so changing weights never retraces
and there is exactly one device dispatch per image batch.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_PIPELINE_CACHE: dict = {}


def _dense_starts(img: int, roi: int, interval: int) -> list[int]:
    """MONAI dense_patch_slices start positions along one dim."""
    if img <= roi:
        return [0]
    num = int(math.ceil((img - roi) / interval)) + 1
    return [min(i * interval, img - roi) for i in range(num)]


def _gaussian_importance(rh: int, rw: int, sigma_scale: float = 0.125) -> jnp.ndarray:
    """MONAI BlendMode.GAUSSIAN importance map (centre-weighted window blend)."""
    def g(n):
        x = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
        s = n * sigma_scale
        return jnp.exp(-0.5 * (x / s) ** 2)

    m = g(rh)[:, None] * g(rw)[None, :]
    return jnp.maximum(m, jnp.max(m) * 1e-3)[None, None]


def _make_pipeline(apply_fn, has_bs, shape, dtype, roi_size, overlap,
                   sw_batch_size, mode, cast_dtype=None):
    """Build the fully-jitted window->forward->stitch program for one input
    geometry. Weights are traced args; window starts and the blend-count
    canvas are trace-time constants."""
    b, c, h, w = shape
    rh, rw = roi_size
    pad_h, pad_w = max(rh - h, 0), max(rw - w, 0)
    hp, wp = h + pad_h, w + pad_w
    ih = max(int(rh * (1 - overlap)), 1)
    iw = max(int(rw * (1 - overlap)), 1)
    starts = [(y, x) for y in _dense_starts(hp, rh, ih) for x in _dense_starts(wp, rw, iw)]
    n_win = len(starts)
    total = n_win * b
    group = min(max(sw_batch_size, b), total)
    n_groups = -(-total // group)
    padded_total = n_groups * group

    if mode == "gaussian":
        one = _gaussian_importance(rh, rw)
    else:
        one = jnp.ones((1, 1, rh, rw), jnp.float32)
    count = np.zeros((1, 1, hp, wp), np.float32)
    one_np = np.asarray(one)
    for y, x in starts:
        count[:, :, y : y + rh, x : x + rw] += one_np
    inv_count = jnp.asarray(1.0 / count)

    def pipeline(params, batch_stats, inputs):
        if pad_h or pad_w:
            inputs = jnp.pad(
                inputs,
                ((0, 0), (0, 0), (pad_h // 2, pad_h - pad_h // 2),
                 (pad_w // 2, pad_w - pad_w // 2)),
            )
        wins = jnp.stack(
            [jax.lax.dynamic_slice(inputs, (0, 0, y, x), (b, c, rh, rw)) for y, x in starts]
        ).reshape(total, c, rh, rw)

        def fwd(g):
            variables = {"params": params}
            if has_bs:
                variables["batch_stats"] = batch_stats
            if cast_dtype is not None:  # reduced-precision forward; stitch f32
                g = g.astype(cast_dtype)
                return apply_fn(variables, g, train=False).astype(jnp.float32)
            return apply_fn(variables, g, train=False)

        if n_groups == 1:
            preds = fwd(wins)
        else:
            wins = jnp.pad(wins, ((0, padded_total - total), (0, 0), (0, 0), (0, 0)))
            preds = jax.lax.map(fwd, wins.reshape(n_groups, group, c, rh, rw))
            preds = preds.reshape(padded_total, -1, rh, rw)[:total]
        k = preds.shape[1]
        onec = one.astype(preds.dtype)
        canvas = jnp.zeros((b, k, hp, wp), preds.dtype)
        for idx, (y, x) in enumerate(starts):
            win = jax.lax.dynamic_slice_in_dim(preds, idx * b, b, axis=0) * onec
            patch = jax.lax.dynamic_slice(canvas, (0, 0, y, x), (b, k, rh, rw)) + win
            canvas = jax.lax.dynamic_update_slice(canvas, patch, (0, 0, y, x))
        out = canvas * inv_count.astype(preds.dtype)
        if pad_h or pad_w:
            out = out[:, :, pad_h // 2 : pad_h // 2 + h, pad_w // 2 : pad_w // 2 + w]
        return out

    return jax.jit(pipeline)


def sliding_window_inference(
    inputs: Array,
    roi_size: Sequence[int],
    predictor: Callable[[Array], Array],
    overlap: float = 0.5,
    sw_batch_size: int = 4,
    mode: str = "constant",
) -> Array:
    """inputs: (B, C, H, W) NCHW. predictor maps (N, C, rh, rw) -> (N, K, rh, rw).
    Returns stitched (B, K, H, W) logits."""
    if hasattr(predictor, "apply_fn"):  # trainer.Predictor: one-dispatch path
        cast_dtype = getattr(predictor, "cast_dtype", None)
        key = (
            id(predictor.apply_fn), predictor.has_bs, inputs.shape,
            str(inputs.dtype), tuple(roi_size), overlap, sw_batch_size, mode,
            str(cast_dtype),
        )
        fn = _PIPELINE_CACHE.get(key)
        if fn is None:
            fn = _make_pipeline(
                predictor.apply_fn, predictor.has_bs, inputs.shape,
                inputs.dtype, tuple(roi_size), overlap, sw_batch_size, mode,
                cast_dtype=cast_dtype,
            )
            _PIPELINE_CACHE[key] = fn
        return fn(predictor.params, predictor.batch_stats, inputs)
    b, c, h, w = inputs.shape
    rh, rw = roi_size

    pad_h, pad_w = max(rh - h, 0), max(rw - w, 0)
    if pad_h or pad_w:
        # symmetric constant padding (MONAI pad_mode="constant")
        inputs = jnp.pad(
            inputs,
            ((0, 0), (0, 0), (pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2)),
        )
    hp, wp = inputs.shape[2:]

    ih = max(int(rh * (1 - overlap)), 1)
    iw = max(int(rw * (1 - overlap)), 1)
    starts = [(y, x) for y in _dense_starts(hp, rh, ih) for x in _dense_starts(wp, rw, iw)]

    windows = jnp.concatenate(
        [jax.lax.dynamic_slice(inputs, (0, 0, y, x), (b, c, rh, rw)) for y, x in starts],
        axis=0,
    )  # (num_win*B, C, rh, rw)

    n_win = len(starts)
    total = n_win * b
    group = max(sw_batch_size, b)
    group = min(group, total)
    outs = []
    for i in range(0, total, group):
        chunk = windows[i : i + group]
        if chunk.shape[0] < group:  # pad last group to keep one compiled shape
            pad = group - chunk.shape[0]
            chunk = jnp.concatenate([chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            outs.append(predictor(chunk)[: group - pad])
        else:
            outs.append(predictor(chunk))
    preds = jnp.concatenate(outs, axis=0)  # (num_win*B, K, rh, rw)
    k = preds.shape[1]

    canvas = jnp.zeros((b, k, hp, wp), preds.dtype)
    count = jnp.zeros((1, 1, hp, wp), preds.dtype)
    if mode == "gaussian":
        one = _gaussian_importance(rh, rw).astype(preds.dtype)
    else:  # constant (MONAI default; reference uses this)
        one = jnp.ones((1, 1, rh, rw), preds.dtype)
    for idx, (y, x) in enumerate(starts):
        win = jax.lax.dynamic_slice_in_dim(preds, idx * b, b, axis=0) * one
        patch = jax.lax.dynamic_slice(canvas, (0, 0, y, x), (b, k, rh, rw)) + win
        canvas = jax.lax.dynamic_update_slice(canvas, patch, (0, 0, y, x))
        cpatch = jax.lax.dynamic_slice(count, (0, 0, y, x), (1, 1, rh, rw)) + one
        count = jax.lax.dynamic_update_slice(count, cpatch, (0, 0, y, x))
    out = canvas / count
    if pad_h or pad_w:
        out = out[:, :, pad_h // 2 : pad_h // 2 + h, pad_w // 2 : pad_w // 2 + w]
    return out


class SlidingWindowInferer:
    """Callable wrapper matching the reference's
    `inference(image, model)` usage."""

    def __init__(self, roi_size, overlap: float = 0.5, sw_batch_size: int = 4,
                 mode: str = "constant"):
        self.roi_size = tuple(roi_size)
        self.overlap = overlap
        self.sw_batch_size = sw_batch_size
        self.mode = mode

    def __call__(self, inputs: Array, predictor: Callable[[Array], Array]) -> Array:
        return sliding_window_inference(
            inputs, self.roi_size, predictor, self.overlap, self.sw_batch_size,
            self.mode,
        )
