"""ConvUNeXt — ConvNeXt-style UNet with gated skip fusion (reference
`/root/reference/src/ConvUneXt/ConvNeXt.py`, 139 LoC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw, resize_bilinear_align_corners
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


def _reflect_pad(x, p=3):
    # reference convs use padding_mode='reflect' (ConvNeXt.py dwconv/in_conv)
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ConvNeXtBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        h = nn.Conv(self.dim, (7, 7), padding="VALID", feature_group_count=self.dim)(_reflect_pad(x))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.Dense(4 * self.dim)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        return nn.gelu(res + h)


class Down(nn.Module):
    out_channels: int
    layer_num: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.Conv(self.out_channels, (2, 2), strides=(2, 2))(x)
        for _ in range(self.layer_num):
            x = ConvNeXtBlock(self.out_channels)(x, train)
        return x


class Up(nn.Module):
    in_channels: int
    out_channels: int
    bilinear: bool = True
    layer_num: int = 1

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        c = self.in_channels // 2
        x1 = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x1)
        if self.bilinear:
            x1 = resize_bilinear_align_corners(x1, (x1.shape[1] * 2, x1.shape[2] * 2))
        else:
            x1 = nn.ConvTranspose(c, (2, 2), strides=(2, 2))(x1)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
        # gated skip fusion (reference Up.forward)
        gate = nn.Dense(3 * c)(x1).reshape(*x1.shape[:3], 3, c)
        g1, g2, g3 = gate[..., 0, :], gate[..., 1, :], gate[..., 2, :]
        x2 = jax.nn.sigmoid(nn.Dense(c)(g1 + x2)) * x2 + jax.nn.sigmoid(g2) * jnp.tanh(g3)
        x2 = nn.Dense(c)(x2)
        x = nn.Conv(self.out_channels, (1, 1))(jnp.concatenate([x2, x1], axis=-1))
        for _ in range(self.layer_num):
            x = ConvNeXtBlock(self.out_channels)(x, train)
        return x


@register_model("ConvUNetXt")
@register_model("ConvUNeXt")
class ConvUNeXt(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    bilinear: bool = True
    base_c: int = 32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        bc = self.base_c
        factor = 2 if self.bilinear else 1
        h = nn.Conv(bc, (7, 7), padding="VALID")(_reflect_pad(x))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.gelu(h)
        x1 = ConvNeXtBlock(bc)(h, train)
        x2 = Down(bc * 2)(x1, train)
        x3 = Down(bc * 4)(x2, train)
        x4 = Down(bc * 8, layer_num=3)(x3, train)
        x5 = Down(bc * 16 // factor)(x4, train)
        h = Up(bc * 16, bc * 8 // factor, self.bilinear)(x5, x4, train)
        h = Up(bc * 8, bc * 4 // factor, self.bilinear)(h, x3, train)
        h = Up(bc * 4, bc * 2 // factor, self.bilinear)(h, x2, train)
        h = Up(bc * 2, bc, self.bilinear)(h, x1, train)
        out = nn.Conv(self.num_classes, (1, 1))(h)
        return nhwc_to_nchw(out)
