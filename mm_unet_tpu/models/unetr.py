"""UNETR (2-D) — ViT encoder + progressive deconv decoder. The reference uses
MONAI's UNETR via a thin subclass (`/root/reference/src/Unetr/Unetr.py:5`,
config `u_netr`: spatial_dims=2, feature_size=64, patch 16, hidden 768);
this is a from-scratch 2-D implementation with the same skip topology:
hidden states tapped at transformer layers 3/6/9/12, progressively
deconvolved to 1/2, 1/4, 1/8 skips, UNet-style decoder."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


class TransformerBlock(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, h)
        x = x + h
        m = nn.LayerNorm(epsilon=1e-5)(x)
        m = nn.Dense(self.mlp_dim)(m)
        m = nn.gelu(m, approximate=False)  # MONAI/torch nn.GELU() is exact erf
        m = nn.Dense(self.hidden)(m)
        return x + m


class ConvBlock(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        h = nn.Conv(self.out, (3, 3), padding="SAME", use_bias=False)(x)
        h = nn.InstanceNorm(epsilon=1e-5)(h)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(self.out, (3, 3), padding="SAME", use_bias=False)(h)
        h = nn.InstanceNorm(epsilon=1e-5)(h)
        if res.shape[-1] != self.out:
            res = nn.InstanceNorm(epsilon=1e-5)(nn.Conv(self.out, (1, 1), use_bias=False)(res))
        return nn.leaky_relu(h + res, 0.01)


class Deconv(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.out, (2, 2), strides=(2, 2))(x)


class PrUpBlock(nn.Module):
    """Progressive upsampling of a ViT feature: 1 deconv, then `num_layer`
    x (deconv + conv block) — MONAI UnetrPrUpBlock."""

    out: int
    num_layer: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Deconv(self.out)(x)
        for _ in range(self.num_layer):
            x = Deconv(self.out)(x)
            x = ConvBlock(self.out)(x, train)
        return x


class UpBlock(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = Deconv(self.out)(x)
        return ConvBlock(self.out)(jnp.concatenate([x, skip], axis=-1), train)


@register_model("UNETR")
class UNETR(nn.Module):
    in_channels: int = 3
    out_channels: int = 1
    img_size: int = 352
    feature_size: int = 64
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    patch_size: int = 16
    spatial_dims: int = 2  # config parity; only 2-D supported

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        b, H, W, _ = x.shape
        p = self.patch_size
        hp, wp = H // p, W // p

        patches = nn.Conv(self.hidden_size, (p, p), strides=(p, p))(x)
        tokens = patches.reshape(b, hp * wp, self.hidden_size)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(0.02), (1, hp * wp, self.hidden_size)
        )
        h = tokens + pos

        taps = {}
        for i in range(1, self.num_layers + 1):
            h = TransformerBlock(self.hidden_size, self.num_heads, self.mlp_dim)(h, train)
            if i in (3, 6, 9, 12):
                taps[i] = h.reshape(b, hp, wp, self.hidden_size)
        taps[12] = nn.LayerNorm(epsilon=1e-5)(h).reshape(b, hp, wp, self.hidden_size)

        fs = self.feature_size
        enc1 = ConvBlock(fs)(x, train)
        enc2 = PrUpBlock(fs * 2, num_layer=2)(taps[3], train)
        enc3 = PrUpBlock(fs * 4, num_layer=1)(taps[6], train)
        enc4 = PrUpBlock(fs * 8, num_layer=0)(taps[9], train)

        dec3 = UpBlock(fs * 8)(taps[12], enc4, train)
        dec2 = UpBlock(fs * 4)(dec3, enc3, train)
        dec1 = UpBlock(fs * 2)(dec2, enc2, train)
        out = UpBlock(fs)(dec1, enc1, train)
        out = nn.Conv(self.out_channels, (1, 1))(out)
        return nhwc_to_nchw(out)
