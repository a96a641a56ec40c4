"""CFPNet — lightweight dilated "channel-wise feature pyramid" segmenter
(reference `/root/reference/src/CFPnet/CFPnet.py`, 298 LoC): init convs,
input-injection pyramid, two CFP stages with asymmetric grouped dilated convs
and hierarchical addition, final 1x1 classifier + bilinear upsample
(align_corners=False)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


class PReLU(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (self.channels,))
        return jnp.where(x >= 0, x, a * x)


class BNPReLU(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)(x)
        return PReLU(self.channels)(x)


class ConvBA(nn.Module):
    out: int
    ksize: tuple
    stride: int = 1
    dilation: tuple = (1, 1)
    groups: int = 1
    bn_acti: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.ksize if isinstance(self.ksize, tuple) else (self.ksize, self.ksize)
        dh, dw = self.dilation
        pad = ((dh * (kh - 1)) // 2, (dw * (kw - 1)) // 2)
        x = nn.Conv(
            self.out, (kh, kw), strides=(self.stride, self.stride),
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            kernel_dilation=self.dilation, feature_group_count=self.groups,
            use_bias=False,
        )(x)
        if self.bn_acti:
            x = BNPReLU(self.out)(x, train)
        return x


class CFPModule(nn.Module):
    n_in: int
    d: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.n_in
        inp = BNPReLU(n)(x, train)
        inp = ConvBA(n // 4, (3, 3), bn_acti=True)(inp, train)

        def branch(h, dil):
            g16, g8 = n // 16, n // 8
            o1 = ConvBA(g16, (3, 1), dilation=(dil, 1), groups=g16, bn_acti=True)(h, train)
            o1 = ConvBA(g16, (1, 3), dilation=(1, dil), groups=g16, bn_acti=True)(o1, train)
            o2 = ConvBA(g16, (3, 1), dilation=(dil, 1), groups=g16, bn_acti=True)(o1, train)
            o2 = ConvBA(g16, (1, 3), dilation=(1, dil), groups=g16, bn_acti=True)(o2, train)
            o3 = ConvBA(g8, (3, 1), dilation=(dil, 1), groups=g16, bn_acti=True)(o2, train)
            o3 = ConvBA(g8, (1, 3), dilation=(1, dil), groups=g8, bn_acti=True)(o3, train)
            return jnp.concatenate([o1, o2, o3], axis=-1)

        d = self.d
        b1 = branch(inp, 1)
        b2 = branch(inp, int(d / 4 + 1))
        b3 = branch(inp, int(d / 2 + 1))
        b4 = branch(inp, d + 1)
        ad1 = b1
        ad2 = ad1 + b2
        ad3 = ad2 + b3
        ad4 = ad3 + b4
        out = jnp.concatenate([ad1, ad2, ad3, ad4], axis=-1)
        out = BNPReLU(n)(out, train)
        out = ConvBA(n, (1, 1))(out, train)
        return out + x


class DownSamplingBlock(nn.Module):
    n_in: int
    n_out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_conv = self.n_out - self.n_in if self.n_in < self.n_out else self.n_out
        out = ConvBA(n_conv, (3, 3), stride=2)(x, train)
        if self.n_in < self.n_out:
            mp = nn.max_pool(x, (2, 2), strides=(2, 2))
            out = jnp.concatenate([out, mp], axis=-1)
        return BNPReLU(self.n_out)(out, train)


def _inject(x, ratio):
    # torch AvgPool2d(3, 2, padding=1) default count_include_pad=True
    for _ in range(ratio):
        x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        count_include_pad=True)
    return x


@register_model("CFPNet")
class CFPNet(nn.Module):
    classes: int = 1
    block_1: int = 2
    block_2: int = 6

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        in_hw = x.shape[1:3]

        h = ConvBA(32, (3, 3), stride=2, bn_acti=True)(x, train)
        h = ConvBA(32, (3, 3), bn_acti=True)(h, train)
        h = ConvBA(32, (3, 3), bn_acti=True)(h, train)

        d1, d2, d3 = _inject(x, 1), _inject(x, 2), _inject(x, 3)
        h = BNPReLU(35)(jnp.concatenate([h, d1], axis=-1), train)

        h1_0 = DownSamplingBlock(35, 64)(h, train)
        h1 = h1_0
        dil1 = [2, 2]
        for i in range(self.block_1):
            h1 = CFPModule(64, d=dil1[i % len(dil1)])(h1, train)
        h = BNPReLU(131)(jnp.concatenate([h1, h1_0, d2], axis=-1), train)

        h2_0 = DownSamplingBlock(131, 128)(h, train)
        h2 = h2_0
        dil2 = [4, 4, 8, 8, 16, 16]
        for i in range(self.block_2):
            h2 = CFPModule(128, d=dil2[i % len(dil2)])(h2, train)
        h = BNPReLU(259)(jnp.concatenate([h2, h2_0, d3], axis=-1), train)

        out = ConvBA(self.classes, (1, 1))(h, train)
        out = jax.image.resize(
            out, (out.shape[0], *in_hw, out.shape[-1]), method="linear"
        )  # align_corners=False (ref parity: `CFPnet.py:290`)
        return nhwc_to_nchw(out)
