"""Parity tests for the fused deform-row-sample + tap-conv Pallas kernel
(`ops/tap_conv.py`) against a pure-jnp reference implementing the same math
as `models/mm_unet._TapConv`'s XLA matmul path: clamped column shifts, 2-hot
bilinear row interpolation, per-tap channel projection. Values and ALL
gradients (feat, y_coords, kernel, bias).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.ops.tap_conv import tap_conv


def _ref(feat, y_coords, kernel, bias, x_shifts):
    b, h, w, c = feat.shape
    k = len(x_shifts)
    yc = jnp.clip(y_coords.astype(jnp.float32), 0, h - 1)
    src = jnp.arange(h, dtype=jnp.float32)
    m = jnp.maximum(
        0.0, 1.0 - jnp.abs(src[None, None, None, None, :] - yc[..., None])
    ).astype(feat.dtype)
    acc = None
    for j, dx in enumerate(x_shifts):
        if dx == 0:
            xs = feat
        elif dx > 0:
            xs = jnp.concatenate(
                [feat[:, :, dx:], jnp.repeat(feat[:, :, -1:], dx, axis=2)], axis=2
            )
        else:
            xs = jnp.concatenate(
                [jnp.repeat(feat[:, :, :1], -dx, axis=2), feat[:, :, :dx]], axis=2
            )
        tap = jnp.einsum("bhws,bswc->bhwc", m[:, :, :, j], xs)
        prj = jnp.einsum("bhwc,cf->bhwf", tap, kernel[j, 0].astype(feat.dtype),
                         preferred_element_type=jnp.float32)
        acc = prj if acc is None else acc + prj
    return (acc + bias).astype(feat.dtype)


def _make(B, H, W, C, F, k, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    feat = f(B, H, W, C)
    # coordinates spanning in-range, sub-pixel, and out-of-range (clip) cases
    yc = f(B, H, W, k) * 3.0 + jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    kernel = f(k, 1, C, F) * 0.3
    bias = f(F) * 0.1
    shifts = [j - k // 2 for j in range(k)]
    return feat, yc, kernel, bias, shifts


@pytest.mark.parametrize("B,H,W,C,F,k", [
    (2, 16, 16, 8, 8, 3),
    (1, 32, 16, 16, 8, 1),
    pytest.param(1, 16, 16, 8, 8, 9, marks=pytest.mark.slow),  # hw=4 halo
    # H % 128 != 0 with H > 128: the ragged output chunk walks qw-wide
    # source pieces (the 704² STARE maps hit S=176; a fixed-128 piece walk
    # produced a negative pad — the silent r3/r4 704-leg failure)
    pytest.param(1, 176, 8, 8, 8, 3, marks=pytest.mark.slow),
])
def test_tap_conv_matches_ref(B, H, W, C, F, k):
    feat, yc, kernel, bias, shifts = _make(B, H, W, C, F, k)
    got = tap_conv(feat, yc, kernel, bias, shifts)
    want = _ref(feat, yc, kernel, bias, shifts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,H,W,C,F,k", [
    (2, 16, 16, 8, 8, 3),
    pytest.param(1, 16, 16, 8, 8, 9, marks=pytest.mark.slow),
])
@pytest.mark.slow
def test_tap_conv_gradients(B, H, W, C, F, k):
    feat, yc, kernel, bias, shifts = _make(B, H, W, C, F, k, seed=3)
    w = jnp.asarray(
        np.random.default_rng(9).standard_normal((B, H, W, F)), jnp.float32
    )

    def loss_pallas(*a):
        return jnp.sum(tap_conv(*a, shifts).astype(jnp.float32) * w)

    def loss_ref(*a):
        return jnp.sum(_ref(*a, shifts).astype(jnp.float32) * w)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(feat, yc, kernel, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(feat, yc, kernel, bias)
    for name, a, b in zip(("feat", "yc", "kernel", "bias"), gp, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-4, atol=2e-4,
            err_msg=f"grad {name}",
        )


def test_tap_conv_bf16_streams():
    feat, yc, kernel, bias, shifts = _make(2, 16, 16, 8, 8, 3, seed=5)
    got = tap_conv(feat.astype(jnp.bfloat16), yc, kernel, bias, shifts)
    want = _ref(feat.astype(jnp.bfloat16), yc, kernel, bias, shifts)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got).astype(np.float32),
        np.asarray(want).astype(np.float32), rtol=3e-2, atol=3e-2,
    )
