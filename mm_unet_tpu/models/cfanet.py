"""CFANet — cross-level feature aggregation net on Res2Net-50 (reference
`/root/reference/src/CFANet/CFANet.py`, 562 LoC): gate fusion of low levels,
two CFF cross-fusions of high levels, edge decoder + dual saliency decoders
with BAM gating, output = edge + two saliency maps + a fused filter map."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw, resize_bilinear_align_corners
from mm_unet_tpu.models.registry import register_model
from mm_unet_tpu.models.resnet import Res2Net50Encoder

Array = jax.Array


def _up2(x):
    return resize_bilinear_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))


class ConvBNReLU(nn.Module):
    out: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        x = nn.Conv(self.out, (k, k), strides=(self.stride, self.stride),
                    padding=((k // 2, k // 2), (k // 2, k // 2)))(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class BasicConv2d(nn.Module):
    """Conv + BN, NO relu (reference `CFANet.py:289-301`)."""

    out: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        x = nn.Conv(self.out, (k, k), padding="SAME", use_bias=False)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)


class ChannelAttention(nn.Module):
    in_planes: int

    @nn.compact
    def __call__(self, x):
        m = jnp.max(x, axis=(1, 2), keepdims=True)
        m = nn.Conv(self.in_planes // 16, (1, 1), use_bias=False)(m)
        m = nn.Conv(self.in_planes, (1, 1), use_bias=False)(nn.relu(m))
        return jax.nn.sigmoid(m)


class GateFusion(nn.Module):
    in_planes: int

    @nn.compact
    def __call__(self, x1, x2):
        cat = jnp.concatenate([x1, x2], axis=-1)
        a1 = nn.Conv(1, (1, 1))(cat)
        a2 = nn.Conv(1, (1, 1))(cat)
        att = jax.nn.softmax(jnp.concatenate([a1, a2], axis=-1), axis=-1)
        return x1 * att[..., :1] + x2 * att[..., 1:]


class GlobalModule(nn.Module):
    channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.channels // self.r, (1, 1))(g)
        g = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(g))
        g = nn.Conv(self.channels, (1, 1))(g)
        g = nn.BatchNorm(use_running_average=not train, momentum=0.9)(g)
        return jax.nn.sigmoid(g)


class BAM(nn.Module):
    channel: int

    @nn.compact
    def __call__(self, x, boun_atten, train: bool = False):
        out1 = BasicConv2d(self.channel)(jnp.concatenate([x, boun_atten], axis=-1), train)
        out2 = GlobalModule(self.channel)(out1, train)
        return x + out1 * out2


class CFF(nn.Module):
    out_channel: int

    @nn.compact
    def __call__(self, x0, x1, train: bool = False):
        oc = self.out_channel
        x0_1 = BasicConv2d(oc // 2, 1)(x0, train)
        x1_1 = BasicConv2d(oc // 2, 1)(x1, train)
        x31 = ConvBNReLU(oc // 2, 3)(jnp.concatenate([x0_1, x1_1], -1), train)
        x51 = ConvBNReLU(oc // 2, 5)(jnp.concatenate([x1_1, x0_1], -1), train)
        x32 = ConvBNReLU(oc // 2, 3)(jnp.concatenate([x31, x51], -1), train)
        x52 = ConvBNReLU(oc // 2, 5)(jnp.concatenate([x51, x31], -1), train)
        return ConvBNReLU(oc, 3)(x0_1 + x1_1 + x32 * x52, train)


@register_model("CFANet")
class CFANet(nn.Module):
    in_class: int = 3
    out_class: int = 1
    channel: int = 64

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        ch = self.channel
        x0, x1, x2, x3, x4 = Res2Net50Encoder()(x, train)

        x0_1 = ConvBNReLU(ch, 3, stride=2)(x0, train)
        x1_1 = ConvBNReLU(ch, 3, stride=2)(x1, train)
        low_x = GateFusion(ch)(x0_1, x1_1)

        edge0 = ConvBNReLU(ch)(_up2(low_x), train)
        edge1 = ConvBNReLU(ch)(_up2(edge0), train)
        edge2 = ConvBNReLU(64)(_up2(edge1), train)
        edge3 = nn.Conv(self.out_class, (1, 1))(edge2)

        att_ori = ChannelAttention(ch)(low_x)
        att_0 = ChannelAttention(ch)(edge0)
        att_1 = ChannelAttention(ch)(edge1)
        att_2 = ChannelAttention(ch)(edge2)

        high1 = CFF(ch)(nn.max_pool(x1, (2, 2), strides=(2, 2)), x2, train)
        high2 = CFF(ch)(_up2(x3), resize_bilinear_align_corners(x4, (x4.shape[1] * 4, x4.shape[2] * 4)), train)

        def cascade(high, tag):
            c0 = BAM(ch)(high, low_x * att_ori, train)
            h0 = ConvBNReLU(ch)(_up2(c0), train)
            c1 = BAM(ch)(h0, edge0 * att_0, train)
            h1 = ConvBNReLU(ch)(_up2(c1), train)
            c2 = BAM(ch)(h1, edge1 * att_1, train)
            h2 = ConvBNReLU(64)(_up2(c2), train)
            c3 = BAM(64)(h2, edge2 * att_2, train)
            sal = nn.Conv(self.out_class, (1, 1))(c3)
            return c3, sal

        cat31, sal1 = cascade(high1, "1")
        cat32, sal2 = cascade(high2, "2")
        sal3 = nn.Conv(self.out_class, (1, 1))(cat31 + cat32)

        return nhwc_to_nchw(edge3 + sal1 + sal2 + sal3)
