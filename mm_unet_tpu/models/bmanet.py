"""BMANet — boundary-aware net on PVTv2-b2 (reference
`/root/reference/src/BMANet/BMANet.py`, 800 LoC): RFB-modified receptive
field blocks, dense aggregation, boundary BAM fusion, three cascaded BMA
refinement heads. NOTE (ref parity): the final output passes through sigmoid
BEFORE the last bilinear upsample (`BMANet.py:722,765`), so this model emits
probabilities, not raw logits."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw, resize_bilinear_align_corners
from mm_unet_tpu.models.pvtv2 import pvt_v2_b2
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


def _up(x, hw):
    return resize_bilinear_align_corners(x, hw)


class BasicConv2d(nn.Module):
    out: int
    kernel: tuple = (1, 1)
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel
        d = self.dilation
        pad = ((d * (kh - 1)) // 2, (d * (kw - 1)) // 2)
        x = nn.Conv(self.out, (kh, kw), padding=((pad[0], pad[0]), (pad[1], pad[1])),
                    kernel_dilation=(d, d), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class RFB(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out
        b0 = BasicConv2d(oc)(x, train)
        b1 = BasicConv2d(oc)(x, train)
        b1 = BasicConv2d(oc, (1, 3))(b1, train)
        b1 = BasicConv2d(oc, (3, 1))(b1, train)
        b1 = BasicConv2d(oc, (3, 3), dilation=3)(b1, train)
        b2 = BasicConv2d(oc)(x, train)
        b2 = BasicConv2d(oc, (1, 5))(b2, train)
        b2 = BasicConv2d(oc, (5, 1))(b2, train)
        b2 = BasicConv2d(oc, (3, 3), dilation=5)(b2, train)
        b3 = BasicConv2d(oc)(x, train)
        b3 = BasicConv2d(oc, (1, 7))(b3, train)
        b3 = BasicConv2d(oc, (7, 1))(b3, train)
        b3 = BasicConv2d(oc, (3, 3), dilation=7)(b3, train)
        cat = BasicConv2d(oc, (3, 3))(jnp.concatenate([b0, b1, b2, b3], -1), train)
        res = BasicConv2d(oc)(x, train)
        return nn.relu(cat + res)


class Aggregation(nn.Module):
    channel: int

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = False):
        ch = self.channel
        up = lambda v: _up(v, (v.shape[1] * 2, v.shape[2] * 2))  # noqa: E731
        x2_1 = BasicConv2d(ch, (3, 3))(up(x1), train) * x2
        x3_1 = (
            BasicConv2d(ch, (3, 3))(up(up(x1)), train)
            * BasicConv2d(ch, (3, 3))(up(x2), train)
            * x3
        )
        x2_2 = jnp.concatenate([x2_1, BasicConv2d(ch, (3, 3))(up(x1), train)], -1)
        x2_2 = BasicConv2d(2 * ch, (3, 3))(x2_2, train)
        x3_2 = jnp.concatenate([x3_1, BasicConv2d(2 * ch, (3, 3))(up(x2_2), train)], -1)
        x3_2 = BasicConv2d(3 * ch, (3, 3))(x3_2, train)
        h = BasicConv2d(3 * ch, (3, 3))(x3_2, train)
        high_global = nn.Conv(ch, (1, 1))(h)
        gmap = nn.Conv(1, (1, 1))(h)
        return gmap, high_global


class CBAMBlock(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        mlp = nn.Sequential([
            nn.Dense(self.channels // self.reduction), nn.relu, nn.Dense(self.channels)
        ])
        avg = mlp(jnp.mean(x, axis=(1, 2)))
        mx = mlp(jnp.max(x, axis=(1, 2)))
        x = x * jax.nn.sigmoid(avg + mx)[:, None, None, :]
        s_avg = jnp.mean(x, axis=-1, keepdims=True)
        s_max = jnp.max(x, axis=-1, keepdims=True)
        # torch SpatialGate: cat((max, mean)), conv WITH bias (`BMANet.py:520`)
        s = nn.Conv(1, (7, 7), padding="SAME")(jnp.concatenate([s_max, s_avg], -1))
        return x * jax.nn.sigmoid(s)


class FusionConv(nn.Module):
    inter: int
    out: int

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        d = self.inter
        h = nn.Conv(d, (1, 1))(jnp.concatenate([x1, x2], -1))
        # ChannelAttentionModule: shared bias-free fc on BOTH avg and max
        # pools, summed (`BMANet.py:545-556`)
        fc = nn.Sequential([
            nn.Conv(d // 4, (1, 1), use_bias=False), nn.relu,
            nn.Conv(d, (1, 1), use_bias=False),
        ])
        ca = fc(jnp.mean(h, axis=(1, 2), keepdims=True)) + fc(
            jnp.max(h, axis=(1, 2), keepdims=True)
        )
        h_c = h * jax.nn.sigmoid(ca)
        s = nn.Conv(d, (3, 3), padding="SAME")(h) + nn.Conv(d, (5, 5), padding="SAME")(h) \
            + nn.Conv(d, (7, 7), padding="SAME")(h)
        savg = jnp.mean(s, axis=-1, keepdims=True)
        smax = jnp.max(s, axis=-1, keepdims=True)
        sat = jax.nn.sigmoid(
            nn.Conv(1, (7, 7), padding="SAME", use_bias=False)(
                jnp.concatenate([savg, smax], -1)
            )
        )
        return nn.Conv(self.out, (1, 1))(s * sat + h_c)


class BMA(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, edge, x, pred, train: bool = False):
        hw = x.shape[1:3]
        pred = jax.nn.sigmoid(_up(pred, hw))
        bg = x * (1 - pred)
        pf = x * nn.Conv(1, (1, 1))(pred)
        ef = x * _up(edge, hw)
        h = jnp.concatenate([bg, pf, ef], -1)
        h = nn.Conv(self.channels, (3, 3), padding="SAME")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(h))
        att = nn.Conv(1, (3, 3), padding="SAME")(h)
        att = jax.nn.sigmoid(nn.BatchNorm(use_running_average=not train, momentum=0.9)(att))
        h = h * att + x
        h = CBAMBlock(self.channels)(h)
        return nn.Conv(1, (1, 1))(h)


@register_model("BMANet")
class BMANet(nn.Module):
    channel: int = 64
    out_channel: int = 1
    model_dir: str = ""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        in_hw = x.shape[1:3]
        ch = self.channel
        x1, x2, x3, x4 = pvt_v2_b2()(x, train)

        r1 = RFB(ch)(x1, train)
        r2 = RFB(ch)(x2, train)
        r3 = RFB(ch)(x3, train)
        r4 = RFB(ch)(x4, train)

        gmap, high_global = Aggregation(ch)(r4, r3, r2, train)
        r4u = _up(r4, (r4.shape[1] * 4, r4.shape[2] * 4))
        r3u = _up(r3, (r3.shape[1] * 2, r3.shape[2] * 2))

        def cbr(v):
            v = nn.Conv(ch, (3, 3), padding="SAME")(v)
            v = nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)
            return nn.relu(v)

        hb = cbr(high_global)
        hb = cbr(hb + r4u)
        hb = cbr(hb + r3u)
        hb = cbr(hb + r2)
        hb = _up(hb, (hb.shape[1] * 2, hb.shape[2] * 2))
        edge = FusionConv(32, 1)(r1, hb, train)

        s4 = BMA(ch)(edge, r4u, gmap, train)
        s3 = BMA(ch)(edge, r3u, s4, train)
        main = BMA(ch)(edge, r2, s3, train)

        out = BasicConv2d(self.out_channel)(main, train)
        out = jax.nn.sigmoid(out)  # ref parity: sigmoid before final upsample
        out = _up(out, in_hw)
        return nhwc_to_nchw(out)
