"""UM_Net — the DSConv-based predecessor of MM_Net (reference
`/root/reference/src/UM_Net/UM_Net.py:304-420` active variant + auxiliary
modules `:10-162`): ResNet-34 encoder, plain 1x1 channel reducers, CBAM
contour branch, RCG with a single-direction Mamba detour, DSConv decoder/
side-out blocks, HPPF pyramid head, output = final head + sum of 5 upsampled
maps. SELayer / NonLocalBlock / ALGM are included for inventory parity (the
reference defines them; its active forward path keeps ALGM commented out)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.dsconv import DSConv
from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw, resize_bilinear_align_corners
from mm_unet_tpu.models.mamba import Mamba
from mm_unet_tpu.models.mm_unet import CBAM
from mm_unet_tpu.models.registry import register_model
from mm_unet_tpu.models.resnet import ResNet34Encoder

Array = jax.Array


class SELayer(nn.Module):
    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.channel // self.reduction, use_bias=False)(y)
        y = nn.relu(y)
        y = jax.nn.sigmoid(nn.Dense(self.channel, use_bias=False)(y))
        return x * y[:, None, None, :]


class NonLocalBlock(nn.Module):
    """Non-local attention with DSConv projections (`UM_Net.py:28-92`)."""

    in_channels: int
    sub_sample: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = max(self.in_channels // 2, 1)
        b, h, w, _ = x.shape
        g = DSConv(inter)(x, train)
        phi = DSConv(inter)(x, train)
        theta = DSConv(inter)(x, train)
        if self.sub_sample:
            g = nn.max_pool(g, (2, 2), strides=(2, 2))
            phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        gq = g.reshape(b, -1, inter)
        tq = theta.reshape(b, -1, inter)
        pq = phi.reshape(b, -1, inter)
        att = jax.nn.softmax(jnp.einsum("bic,bjc->bij", tq, pq), axis=-1)
        y = jnp.einsum("bij,bjc->bic", att, gq).reshape(b, h, w, inter)
        wy = DSConv(self.in_channels)(y, train)
        wy = nn.BatchNorm(use_running_average=not train, momentum=0.9)(wy)
        return wy + x


class HPPF(nn.Module):
    """Pyramid pooling attention head (`UM_Net.py:97-131`)."""

    in_channels: int

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = False):
        hw = x1.shape[1:3]
        x2 = resize_bilinear_align_corners(x2, hw)
        x3 = resize_bilinear_align_corners(x3, hw)
        feat = jnp.concatenate([x1, x2, x3], axis=-1)
        b, h, w, c = feat.shape
        y1 = jnp.mean(feat, axis=(1, 2), keepdims=True)
        # adaptive max pools to 4x4 / 8x8 then 1x1-equivalent channel reshape.
        # The reference flattens NCHW tensors (`UM_Net.py:123-124`:
        # y.reshape(b, c, 1, 1) on (b, c/16, 4, 4)), i.e. channel-major order —
        # transpose to channel-first before the reshape to match.
        m1 = nn.max_pool(feat, (h // 4, w // 4), strides=(h // 4, w // 4))
        m2 = nn.max_pool(feat, (h // 8, w // 8), strides=(h // 8, w // 8))
        y2 = nn.relu(DSConv(c // 16)(m1, train))
        y2 = jnp.transpose(y2, (0, 3, 1, 2)).reshape(b, 1, 1, c)
        y3 = nn.relu(nn.Conv(c // 64, (1, 1))(m2))
        y3 = jnp.transpose(y3, (0, 3, 1, 2)).reshape(b, 1, 1, c)
        z = (y1 + y2 + y3) / 3.0
        att = nn.Conv(c // 8, (1, 1))(z)
        att = jax.nn.sigmoid(nn.Conv(c, (1, 1))(nn.relu(att)))
        out = att * feat
        out = nn.Conv(c // 3, (3, 3), padding="SAME")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        return nn.relu(out)


class ALGM(nn.Module):
    """Local-global pyramid module (`UM_Net.py:133-186`); inventory parity —
    the active UM_Net forward keeps it disabled, as does this one."""

    mid_ch: int
    pool_size: tuple
    out_list: tuple
    cascade: bool = False

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        in_ch = self.mid_ch // 4
        hw = x.shape[1:3]
        h = nn.Conv(in_ch, (3, 3), padding="SAME")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(h))
        ctx = [NonLocalBlock(in_ch)(h, train)]
        d1 = self.pool_size[0]
        c1 = nn.Conv(in_ch, (3, 3), padding=[(d1, d1)] * 2, kernel_dilation=(d1, d1))(h)
        ctx.append(nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(c1)))
        x1 = jnp.concatenate([h, ctx[0]], axis=-1)
        d2 = self.pool_size[1]
        c2 = nn.Conv(in_ch, (3, 3), padding=[(d2, d2)] * 2, kernel_dilation=(d2, d2))(x1)
        ctx.append(nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(c2)))
        x2 = jnp.concatenate([h, ctx[1], ctx[2]], axis=-1)
        d3 = self.pool_size[2]
        c3 = nn.Conv(in_ch, (3, 3), padding=[(d3, d3)] * 2, kernel_dilation=(d3, d3))(x2)
        ctx.append(nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(c3)))
        lg = jnp.concatenate(ctx, axis=-1)

        outs = []
        for j, oc in enumerate(self.out_list):
            o = SELayer(in_ch * 4)(lg)
            o = nn.Conv(oc, (3, 3), padding="SAME")(o)
            o = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(o))
            if self.cascade and y is not None:
                m = jnp.abs(resize_bilinear_align_corners(y[j], hw) - o)
                m = nn.Conv(64, (3, 3), padding="SAME")(m)
                m = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(m))
                o = o + m
            outs.append(o)
        return outs


class RCG(nn.Module):
    """UM_Net's RCG: DSConv fuse + single-direction Mamba (`UM_Net.py:221-283`)."""

    d_state: int = 16
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, pre, edge, f, train: bool = False):
        r = (1.0 - jax.nn.sigmoid(pre)) * f
        edge1 = resize_bilinear_align_corners(edge, f.shape[1:3])
        x1 = jnp.concatenate([edge1, r], axis=-1)
        x2 = DSConv(64)(x1, train)
        x2 = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(x2))

        x0 = nn.ConvTranspose(64, (4, 4), strides=(2, 2), padding="SAME")(x2)
        b, h2, w2, c = x0.shape
        out = Mamba(d_model=64, d_state=self.d_state, d_conv=self.d_conv,
                    expand=self.expand, bimamba_type="none", name="mamba")(
            x0.reshape(b, h2 * w2, c)
        )
        x0 = nn.Conv(64, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))(
            out.reshape(b, h2, w2, c)
        )
        x3 = jax.nn.sigmoid(nn.Conv(1, (1, 1))(x2))
        return x0 * x3 * x2 + f


class DecoderBlock(nn.Module):
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DSConv(self.in_channels // 4)(x, train)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(x))
        x = DSConv(self.out_channels)(x, train)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(x))
        return resize_bilinear_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))


class SideoutBlock(nn.Module):
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DSConv(self.in_channels // 4)(x, train)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(x))
        x = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train)(x)
        return nn.Conv(self.out_channels, (1, 1))(x)


@register_model("UM_Net")
class UM_Net(nn.Module):
    num_classes: int = 1
    num_slices_list: tuple = (64, 32, 16, 8)  # config parity (unused by RCG here)
    out_indices: tuple = (0, 1, 2, 3)
    heads: tuple = (1, 2, 4, 4)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        in_hw = x.shape[1:3]

        e1, l1, l2, l3, l4 = ResNet34Encoder()(x, train)

        def down(v):
            v = nn.Conv(64, (1, 1))(v)
            v = nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)
            return nn.relu(v)

        e2, e3, e4, e5 = l1, down(l2), down(l3), down(l4)

        d5 = DecoderBlock(64, 64)(e5, train)
        out5 = SideoutBlock(64, self.num_classes)(d5, train)

        c1 = nn.Conv(64, (3, 3), padding="SAME")(e1)
        c1 = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(c1))
        c1 = CBAM(64)(c1)
        c1 = nn.Conv(64, (3, 3), padding="SAME")(c1)
        c1 = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(c1))
        p_c = nn.Conv(1, (3, 3), padding="SAME")(c1)

        r4 = RCG()(out5, c1, e4, train)
        d4 = DecoderBlock(128, 64)(jnp.concatenate([d5, r4], -1), train)
        out4 = SideoutBlock(64, self.num_classes)(d4, train)

        r3 = RCG()(out4, c1, e3, train)
        d3 = DecoderBlock(128, 64)(jnp.concatenate([d4, r3], -1), train)
        out3 = SideoutBlock(64, self.num_classes)(d3, train)

        r2 = RCG()(out3, c1, e2, train)
        d2 = DecoderBlock(128, 64)(jnp.concatenate([d3, r2], -1), train)
        out2 = SideoutBlock(64, self.num_classes)(d2, train)

        p = HPPF(192)(d2, d3, d4, train)
        out1 = nn.Conv(32, (3, 3), padding="SAME")(p)
        out1 = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9)(out1))
        out1 = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train)(out1)
        out1 = nn.Conv(self.num_classes, (1, 1))(out1)

        total = resize_bilinear_align_corners(out1, in_hw)
        for o in (out2, out3, out4, out5, p_c):
            total = total + resize_bilinear_align_corners(o, in_hw)
        return nhwc_to_nchw(total)
