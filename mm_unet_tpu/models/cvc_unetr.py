"""CVC-UNETR — PVTv2-b2 + global/local attention decoder with a
GlobalSparseTransformer + LocalReverseDiffusion head (reference
`/root/reference/src/CVCUNETR/NewCVC.py:447-649`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw
from mm_unet_tpu.models.pvtv2 import PVTv2
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


def _up(x, hw):
    return jax.image.resize(x, (x.shape[0], *hw, x.shape[-1]), method="linear")


def _gelu(x):
    return nn.gelu(x, approximate=False)  # torch nn.GELU default is exact erf


_ACTS = {"relu": nn.relu, "gelu": _gelu, "silu": nn.silu}


class BasicConv2d(nn.Module):
    out: int
    kernel: int = 1
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        x = nn.Conv(self.out, (k, k), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return _ACTS[self.act](x)


class GobleAttention(nn.Module):
    out_dim: int
    kernel_size: int = 3
    mlp_ratio: int = 4
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _ACTS[self.act]
        od = self.out_dim
        x = nn.Conv(od, (3, 3), padding="SAME")(x)
        x = nn.GroupNorm(num_groups=od // 2, epsilon=1e-5)(x)
        x = act(x)
        identity = x

        def bn(v):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)

        k = self.kernel_size
        base = bn(nn.Conv(od, (k, k), padding="SAME", feature_group_count=od,
                          use_bias=False)(x))
        add = bn(nn.Conv(od, (1, 1), feature_group_count=od, use_bias=False)(x))
        x = base + add + x
        # MLP (1x1 convs)
        h = nn.Conv(od * self.mlp_ratio, (1, 1), use_bias=False)(x)
        h = act(h)
        h = nn.Conv(od, (1, 1), use_bias=False)(h)
        return h + identity


class LocalAttention(nn.Module):
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(v):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)

        x = bn(x)
        x = nn.Conv(self.in_dim, (1, 1), use_bias=False)(x)
        x = nn.Conv(self.in_dim, (3, 3), padding="SAME",
                    feature_group_count=self.in_dim, use_bias=False)(x)
        x = bn(x)
        return nn.Conv(self.out_dim, (1, 1), use_bias=False)(x)


class AttentionBlock(nn.Module):
    in_dim: int
    out_dim: int
    kernel_size: int = 3
    mlp_ratio: int = 4
    shallow: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = "gelu" if self.shallow else "silu"
        half = self.in_dim // 2
        x0 = GobleAttention(self.out_dim, self.kernel_size, self.mlp_ratio, act)(
            x[..., :half], train
        )
        x1 = LocalAttention(half, self.out_dim)(x[..., half:], train)
        h = jnp.concatenate([x0, x1], axis=-1)
        return BasicConv2d(self.out_dim, 1, act)(h, train)


class GlobalSparseTransformer(nn.Module):
    channels: int
    r: int = 4
    heads: int = 2

    @nn.compact
    def __call__(self, x):
        r = self.r
        x = nn.avg_pool(x, (1, 1), strides=(r, r))  # sparse sampler
        b, h, w, c = x.shape
        hd = c // self.heads
        qkv = nn.Conv(3 * c, (1, 1), use_bias=False)(x)
        # reference channel layout is head-major, q/k/v contiguous per head
        # (`NewCVC.py:559-561`: view(B, heads, 3*hd, HW).split(hd, dim=2))
        qkv = qkv.reshape(b, h * w, self.heads, 3, hd)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
        att = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", q, k), axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, h, w, c)
        return out


class LocalReverseDiffusion(nn.Module):
    in_channels: int
    out_channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x):
        r = self.r
        b, h, w, c = x.shape
        # depthwise ConvTranspose(kernel=r, stride=r): each input pixel paints
        # an r x r block with a per-channel kernel
        kern = self.param("kernel", nn.initializers.lecun_normal(), (r * r, c))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        k = kern.reshape(r, r, c)
        up = x[:, :, None, :, None, :] * k[None, None, :, None, :, :]
        up = up.reshape(b, h * r, w * r, c) + bias
        up = nn.GroupNorm(num_groups=1, epsilon=1e-5)(up)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False)(up)


@register_model("CVC_UNETR")
class CVC_Unetr(nn.Module):
    in_channels: int = 3
    out_channels: int = 1
    dims: tuple = (64, 128, 320, 512)
    out_dim: int = 32
    kernel_size: int = 3
    mlp_ratio: int = 4
    model_dir: str = ""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        c1, c2, c3, c4 = PVTv2(embed_dims=self.dims)(x, train)
        od = self.out_dim
        _c4 = AttentionBlock(self.dims[3], od, self.kernel_size, self.mlp_ratio, False)(c4, train)
        _c4 = _up(_c4, c3.shape[1:3])
        _c3 = AttentionBlock(self.dims[2], od, self.kernel_size, self.mlp_ratio, False)(c3, train)
        _c2 = AttentionBlock(self.dims[1], od, self.kernel_size, self.mlp_ratio, True)(c2, train)

        fused = jnp.concatenate([_up(_c4, c2.shape[1:3]), _up(_c3, c2.shape[1:3])], axis=-1)
        out1 = BasicConv2d(od, 1)(fused, train)
        out1 = nn.Conv(self.out_channels, (1, 1), use_bias=False)(out1)

        lf = BasicConv2d(od, 3)(c1, train)
        hf = BasicConv2d(od, 1)(_c2, train)
        hf = _up(hf, lf.shape[1:3])
        h = jnp.concatenate([hf, lf], axis=-1)
        out2 = LocalReverseDiffusion(od * 2, self.out_channels)(
            GlobalSparseTransformer(od * 2)(h)
        )

        out1 = _up(out1, (out1.shape[1] * 8, out1.shape[2] * 8))
        out2 = _up(out2, (out2.shape[1] * 4, out2.shape[2] * 4))
        return nhwc_to_nchw(out1 + out2)
