"""Dynamic-snake deformable conv (DSConv) — the non-Mamba predecessor of
MMConv, used throughout UM_Net (reference
`/root/reference/src/UM_Net/DSC_conv.py:8-80` and `get_coordinate_map_2D`
`:85-230`). Both morphologies:

- morph 0: y-coordinates deform (cumulative offsets from the kernel centre),
  x = column + linspace spread; rows expand k-fold; (k,1)/stride-(k,1) conv.
- morph 1: x-coordinates deform, y = row + spread; columns expand k-fold;
  (1,k)/stride-(1,k) conv.

NHWC; grid sampling bilinear/zeros/align_corners=True (ref parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import deform_sample, grid_sample_bilinear_nhwc
from mm_unet_tpu.ops.geometry import accumulate_offsets_from_center_last

Array = jax.Array


class DSConv(nn.Module):
    out_channels: int
    kernel_size: int = 9
    extend_scope: float = 1.0
    morph: int = 0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.morph not in (0, 1):
            raise ValueError("morph should be 0 or 1.")
        b, h, w, _ = x.shape
        k = self.kernel_size
        center = k // 2

        offset = nn.Conv(2 * k, (3, 3), padding="SAME")(x)
        offset = nn.GroupNorm(num_groups=k, epsilon=1e-5)(offset)
        offset = jnp.tanh(offset)
        y_off, x_off = offset[..., :k], offset[..., k:]

        rows = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        cols = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        spread = jnp.linspace(-center, center, k, dtype=jnp.float32)[None, None, None, :]

        if self.morph == 0:
            y_new = rows + accumulate_offsets_from_center_last(y_off) * self.extend_scope
            # fast path: integer x taps -> column shift + row interpolation
            deformed = deform_sample(x, y_new, [j - center for j in range(k)])
            out = nn.Conv(self.out_channels, (k, 1), strides=(k, 1), padding="VALID",
                          name="dsc_conv_x")(deformed)
            return nn.GroupNorm(num_groups=self.out_channels // 4, epsilon=1e-5)(out)
        else:
            x_new = cols + accumulate_offsets_from_center_last(x_off) * self.extend_scope
            y_new = jnp.broadcast_to(rows + spread, x_new.shape)
            # (B,H,W,K) -> (B, H, W*K): taps consecutive per column
            y_map = y_new.reshape(b, h, w * k)
            x_map = x_new.reshape(b, h, w * k)

        y_s = jnp.clip(y_map, 0, h - 1) * (2.0 / max(h - 1, 1)) - 1.0
        x_s = jnp.clip(x_map, 0, w - 1) * (2.0 / max(w - 1, 1)) - 1.0
        grid = jnp.stack([x_s, y_s], axis=-1)
        deformed = grid_sample_bilinear_nhwc(x, grid)
        out = nn.Conv(self.out_channels, (1, k), strides=(1, k), padding="VALID",
                      name="dsc_conv_y")(deformed)
        return nn.GroupNorm(num_groups=self.out_channels // 4, epsilon=1e-5)(out)
