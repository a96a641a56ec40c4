"""PVT-CASCADE — PVTv2-b2 encoder + CASCADE attention decoder (reference
`/root/reference/src/PVT_CA/PVT_CA.py:270-346,583-628`): attention-gated
skips, channel+spatial attention at each level, sum of 4 upsampled heads."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw
from mm_unet_tpu.models.pvtv2 import pvt_v2_b2
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


def _up(x, scale):
    return jax.image.resize(
        x, (x.shape[0], x.shape[1] * scale, x.shape[2] * scale, x.shape[3]), "linear"
    )


class ConvBlock(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.out, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
        return x


class UpConv(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference up_conv uses bare nn.Upsample(scale_factor=2) — NEAREST
        # mode (`PVT_CA.py:196`), unlike the bilinear prediction heads
        x = jax.image.resize(
            x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]), "nearest"
        )
        x = nn.Conv(self.out, (3, 3), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class AttentionGate(nn.Module):
    f_int: int

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        def bn(v):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)

        g1 = bn(nn.Conv(self.f_int, (1, 1))(g))
        x1 = bn(nn.Conv(self.f_int, (1, 1))(x))
        psi = nn.relu(g1 + x1)
        psi = jax.nn.sigmoid(bn(nn.Conv(1, (1, 1))(psi)))
        return x * psi


class ChannelAttention(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, x):
        mlp = nn.Sequential([
            nn.Conv(self.planes // 16, (1, 1), use_bias=False),
            nn.relu,
            nn.Conv(self.planes, (1, 1), use_bias=False),
        ])
        avg = mlp(jnp.mean(x, axis=(1, 2), keepdims=True))
        mx = mlp(jnp.max(x, axis=(1, 2), keepdims=True))
        return jax.nn.sigmoid(avg + mx)


def spatial_attention(x, conv):
    avg = jnp.mean(x, axis=-1, keepdims=True)
    mx = jnp.max(x, axis=-1, keepdims=True)
    return jax.nn.sigmoid(conv(jnp.concatenate([avg, mx], axis=-1)))


@register_model("PVT_CASCADE")
class PVT_CASCADE(nn.Module):
    n_class: int = 3  # input channels (reference naming)
    o_class: int = 1
    model_dir: str = ""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        x1, x2, x3, x4 = pvt_v2_b2()(x, train)
        ch = (512, 320, 128, 64)
        sa_conv = nn.Conv(1, (7, 7), padding="SAME", use_bias=False)

        d4 = nn.Conv(ch[0], (1, 1))(x4)
        d4 = ChannelAttention(ch[0])(d4) * d4
        d4 = spatial_attention(d4, sa_conv) * d4
        d4 = ConvBlock(ch[0])(d4, train)

        d3 = UpConv(ch[1])(d4, train)
        s3 = AttentionGate(ch[2])(d3, x3, train)
        d3 = jnp.concatenate([s3, d3], axis=-1)
        d3 = ChannelAttention(2 * ch[1])(d3) * d3
        d3 = spatial_attention(d3, sa_conv) * d3
        d3 = ConvBlock(ch[1])(d3, train)

        d2 = UpConv(ch[2])(d3, train)
        s2 = AttentionGate(ch[3])(d2, x2, train)
        d2 = jnp.concatenate([s2, d2], axis=-1)
        d2 = ChannelAttention(2 * ch[2])(d2) * d2
        d2 = spatial_attention(d2, sa_conv) * d2
        d2 = ConvBlock(ch[2])(d2, train)

        d1 = UpConv(ch[3])(d2, train)
        s1 = AttentionGate(32)(d1, x1, train)
        d1 = jnp.concatenate([s1, d1], axis=-1)
        d1 = ChannelAttention(2 * ch[3])(d1) * d1
        d1 = spatial_attention(d1, sa_conv) * d1
        d1 = ConvBlock(ch[3])(d1, train)

        p1 = _up(nn.Conv(self.o_class, (1, 1))(d4), 32)
        p2 = _up(nn.Conv(self.o_class, (1, 1))(d3), 16)
        p3 = _up(nn.Conv(self.o_class, (1, 1))(d2), 8)
        p4 = _up(nn.Conv(self.o_class, (1, 1))(d1), 4)
        return nhwc_to_nchw(p1 + p2 + p3 + p4)
