"""Classic UNet baseline (reference `/root/reference/src/Unet/Unet.py` +
`unet_parts.py`): DoubleConv / Down / Up / OutConv, bilinear or
transposed-conv upsampling. NHWC internally, NCHW interface."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw, resize_bilinear_align_corners
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


class DoubleConv(nn.Module):
    features: int
    mid_features: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_features or self.features
        for f in (mid, self.features):
            x = nn.Conv(f, (3, 3), padding="SAME", use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
        return x


class Up(nn.Module):
    features: int
    bilinear: bool = True

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        if self.bilinear:
            x1 = resize_bilinear_align_corners(x1, (x1.shape[1] * 2, x1.shape[2] * 2))
            # reference: DoubleConv(in_ch, out_ch, mid=in_ch//2) where in_ch
            # is the CONCATENATED width (x1 + skip, equal halves) -> mid ==
            # x1 channels (unet_parts.py Up.__init__)
            conv = DoubleConv(self.features, mid_features=x1.shape[-1])
        else:
            x1 = nn.ConvTranspose(x1.shape[-1] // 2, (2, 2), strides=(2, 2))(x1)
            conv = DoubleConv(self.features)
        # pad to match skip spatial dims (reference unet_parts.py Up.forward)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
        return conv(jnp.concatenate([x2, x1], axis=-1), train)


@register_model("UNet")
class UNet(nn.Module):
    n_channels: int = 3
    num_classes: int = 1
    bilinear: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        factor = 2 if self.bilinear else 1
        x1 = DoubleConv(64)(x, train)
        x2 = DoubleConv(128)(nn.max_pool(x1, (2, 2), strides=(2, 2)), train)
        x3 = DoubleConv(256)(nn.max_pool(x2, (2, 2), strides=(2, 2)), train)
        x4 = DoubleConv(512)(nn.max_pool(x3, (2, 2), strides=(2, 2)), train)
        x5 = DoubleConv(1024 // factor)(nn.max_pool(x4, (2, 2), strides=(2, 2)), train)
        y = Up(512 // factor, self.bilinear)(x5, x4, train)
        y = Up(256 // factor, self.bilinear)(y, x3, train)
        y = Up(128 // factor, self.bilinear)(y, x2, train)
        y = Up(64, self.bilinear)(y, x1, train)
        out = nn.Conv(self.num_classes, (1, 1))(y)
        return nhwc_to_nchw(out)
