"""Geometry op tests: grid_sample vs torch (CPU) golden; flatten round-trips;
offset accumulation vs the reference's iterative loop semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_unet_tpu.ops.geometry import (
    accumulate_offsets_from_center,
    inverse_two_row_columnwise_flatten,
    two_row_columnwise_flatten,
)
from mm_unet_tpu.ops.grid_sample import grid_sample_bilinear


@pytest.mark.parametrize("H,W", [(8, 8), (7, 5), (1, 4)])
def test_two_row_flatten_roundtrip(H, W):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    flat = two_row_columnwise_flatten(jnp.asarray(x))
    assert flat.shape == (2, 3, H * W)
    back = inverse_two_row_columnwise_flatten(flat, H, W)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_two_row_flatten_order():
    # 2x3 block: expect row0[0], row1[0], row0[1], row1[1], row0[2], row1[2]
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 1, 2, 3)  # rows [0,1,2],[3,4,5]
    flat = np.asarray(two_row_columnwise_flatten(x))[0, 0]
    np.testing.assert_array_equal(flat, [0, 3, 1, 4, 2, 5])


@pytest.mark.parametrize("k", [1, 3, 9])
def test_accumulate_offsets_matches_loop(k):
    rng = np.random.default_rng(1)
    off = rng.standard_normal((2, k, 4, 5)).astype(np.float32)
    out = np.asarray(accumulate_offsets_from_center(jnp.asarray(off)))
    # reference loop (MMUNet.py:162-171)
    exp = off.copy()
    center = k // 2
    exp[:, center] = 0
    for i in range(1, center + 1):
        exp[:, center + i] = exp[:, center + i - 1] + off[:, center + i]
        exp[:, center - i] = exp[:, center - i + 1] + off[:, center - i]
    np.testing.assert_allclose(out, exp, rtol=1e-6, atol=1e-6)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    feat = rng.standard_normal((2, 4, 9, 7)).astype(np.float32)
    # grid partly out of range to exercise zeros padding
    grid = (rng.uniform(-1.3, 1.3, size=(2, 5, 6, 2))).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(feat), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=True,
    ).numpy()
    got = np.asarray(grid_sample_bilinear(jnp.asarray(feat), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_identity():
    rng = np.random.default_rng(3)
    feat = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    ys, xs = np.meshgrid(np.linspace(-1, 1, 6), np.linspace(-1, 1, 6), indexing="ij")
    grid = np.stack([xs, ys], axis=-1)[None].astype(np.float32)
    got = np.asarray(grid_sample_bilinear(jnp.asarray(feat), jnp.asarray(grid)))
    np.testing.assert_allclose(got, feat, rtol=1e-5, atol=1e-5)


def test_deform_sample_rows_matches_grid_sample():
    """The specialised morph-0 sampler must match generic grid_sample for
    integer x-taps (the only configuration MMConv/DSConv morph-0 produce)."""
    from mm_unet_tpu.models.layers import deform_sample_rows, grid_sample_bilinear_nhwc

    rng = np.random.default_rng(0)
    B, H, W, C, k = 2, 9, 7, 4, 3
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    y = (rng.uniform(-2, H + 2, size=(B, H, W, k))).astype(np.float32)

    center = k // 2
    fast = deform_sample_rows(jnp.asarray(feat), jnp.asarray(y),
                              [j - center for j in range(k)])

    cols = np.arange(W, dtype=np.float32)[None, None, :, None]
    spread = np.linspace(-center, center, k, dtype=np.float32)[None, None, None, :]
    x_new = np.broadcast_to(cols + spread, y.shape)
    y_map = np.transpose(y, (0, 1, 3, 2)).reshape(B, H * k, W)
    x_map = np.transpose(x_new, (0, 1, 3, 2)).reshape(B, H * k, W)
    y_s = np.clip(y_map, 0, H - 1) * (2.0 / (H - 1)) - 1.0
    x_s = np.clip(x_map, 0, W - 1) * (2.0 / (W - 1)) - 1.0
    grid = np.stack([x_s, y_s], axis=-1)
    want = grid_sample_bilinear_nhwc(jnp.asarray(feat), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_tapconv_matches_deform_sample_plus_conv():
    """The fused _TapConv (morph-0 sample + (k,1)-stride-k conv in one tap
    loop) must equal the explicit deformed-tensor + nn.Conv composition."""
    from mm_unet_tpu.models.mm_unet import _TapConv
    from mm_unet_tpu.models.layers import deform_sample

    rng = np.random.default_rng(0)
    B, H, W, C, K, F = 2, 12, 10, 8, 3, 16
    feat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, H, (B, H, W, K)), jnp.float32)
    tc = _TapConv(F, K)
    vs = tc.init(jax.random.key(0), feat, y)
    got = tc.apply(vs, feat, y)
    deformed = deform_sample(feat, y, [j - K // 2 for j in range(K)])
    want = jax.lax.conv_general_dilated(
        deformed, vs["params"]["kernel"], window_strides=(K, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + vs["params"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
