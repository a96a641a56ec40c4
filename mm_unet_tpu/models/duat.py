"""DuAT — dual-aggregate transformer on a PVTv2-b2 backbone (reference
`/root/reference/src/DuAT/DuAT.py`, 386 LoC): GLSA global-local attention
(ContextBlock + ConvBranch), SBA boundary aggregation, sum of two upsampled
heads (bilinear, align_corners=False)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw
from mm_unet_tpu.models.pvtv2 import pvt_v2_b2
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


def _up(x, hw):
    return jax.image.resize(x, (x.shape[0], *hw, x.shape[-1]), method="linear")


class BasicConv2d(nn.Module):
    out: int
    kernel: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, d = self.kernel, self.dilation
        pad = d * (k - 1) // 2
        x = nn.Conv(self.out, (k, k), padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(d, d), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class ContextBlock(nn.Module):
    """Global-context block with attention pooling + channel-mul fusion
    (`DuAT.py:71-160`)."""

    inplanes: int
    ratio: float = 2.0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        mask = nn.Conv(1, (1, 1))(x).reshape(b, h * w, 1)
        mask = jax.nn.softmax(mask, axis=1)
        context = jnp.einsum("bnc,bn1->bc", x.reshape(b, h * w, c), mask)
        context = context[:, None, None, :]
        planes = int(self.inplanes * self.ratio)
        t = nn.Conv(planes, (1, 1))(context)
        t = nn.LayerNorm(epsilon=1e-5)(t)  # torch nn.LayerNorm default eps
        t = nn.relu(t)
        # last conv zero-init (reference last_zero_init)
        t = nn.Conv(self.inplanes, (1, 1), kernel_init=nn.initializers.zeros)(t)
        return x + x * jax.nn.sigmoid(t)


class ConvBranch(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        res1, res2 = x, x

        def cbr(v, k, groups=1, act="relu", bn=True):
            v = nn.Conv(f, (k, k), padding="SAME", feature_group_count=groups,
                        use_bias=False)(v)
            if bn:
                v = nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)
            return nn.silu(v) if act == "silu" else nn.relu(v)

        h = cbr(x, 1)
        h = h + cbr(h, 3, groups=f)
        h = cbr(h, 1)
        h = h + cbr(h, 3, groups=f)
        h = cbr(h, 1, act="silu")
        h = h + cbr(h, 3, groups=f)
        h = nn.relu(nn.Conv(f, (1, 1), use_bias=False)(h))
        return res2 + res1 * jax.nn.sigmoid(h)


class GLSA(nn.Module):
    input_dim: int
    embed_dim: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.input_dim // 2
        x0, x1 = x[..., :half], x[..., half:]
        local = ConvBranch(self.embed_dim)(nn.Conv(self.embed_dim, (1, 1))(x0), train)
        glob = ContextBlock(self.embed_dim)(nn.Conv(self.embed_dim, (1, 1))(x1))
        h = jnp.concatenate([local, glob], axis=-1)
        return BasicConv2d(self.embed_dim, 1)(h, train)


class SBA(nn.Module):
    input_dim: int = 32
    out_channels: int = 1

    @nn.compact
    def __call__(self, hf, lf, train: bool = False):
        half = self.input_dim // 2
        lf = nn.Conv(half, (1, 1), use_bias=False)(lf)
        hf = nn.Conv(half, (1, 1), use_bias=False)(hf)
        g_l, g_h = jax.nn.sigmoid(lf), jax.nn.sigmoid(hf)
        lf = BasicConv2d(half, 1)(lf, train)
        hf = BasicConv2d(half, 1)(hf, train)
        lf = lf + lf * g_l + (1 - g_l) * _up(g_h * hf, lf.shape[1:3])
        hf = hf + hf * g_h + (1 - g_h) * _up(g_l * lf, hf.shape[1:3])
        hf = _up(hf, lf.shape[1:3])
        h = BasicConv2d(self.input_dim, 3)(jnp.concatenate([hf, lf], axis=-1), train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False)(h)


@register_model("DuAT")
class DuAT(nn.Module):
    in_channels: int = 3
    out_channels: int = 1
    dim: int = 32
    dims: tuple = (64, 128, 320, 512)
    model_dir: str = ""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        c1, c2, c3, c4 = pvt_v2_b2()(x, train)
        d = self.dim
        _c4 = GLSA(self.dims[3], d)(c4, train)
        _c4 = _up(_c4, c3.shape[1:3])
        _c3 = GLSA(self.dims[2], d)(c3, train)
        _c2 = GLSA(self.dims[1], d)(c2, train)

        fuse2 = jnp.concatenate(
            [_up(_c4, c2.shape[1:3]), _up(_c3, c2.shape[1:3]), _c2], axis=-1
        )
        out1 = BasicConv2d(d, 1)(fuse2, train)
        out1 = nn.Conv(self.out_channels, (1, 1), use_bias=False)(out1)

        lf = BasicConv2d(d, 3)(c1, train)
        hf = BasicConv2d(d, 1)(jnp.concatenate([_c4, _c3], axis=-1), train)
        hf = _up(hf, c2.shape[1:3])
        out2 = SBA(d, self.out_channels)(hf, lf, train)

        out1 = _up(out1, (out1.shape[1] * 8, out1.shape[2] * 8))
        out2 = _up(out2, (out2.shape[1] * 4, out2.shape[2] * 4))
        return nhwc_to_nchw(out1 + out2)
