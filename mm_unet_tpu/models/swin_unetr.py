"""SwinUNETR (2-D) — Swin transformer encoder + UNETR-style decoder. The
reference uses MONAI's SwinUNETR via a thin subclass
(`/root/reference/src/SwinUNETR/SwinUNETR.py:5`, config: spatial_dims=2,
use_checkpoint) — this is a from-scratch 2-D implementation: patch-2 embed,
4 stages of shifted-window attention (window 7, relative position bias,
cyclic-shift masking), patch merging, and the 5-skip UNETR decoder.
`use_checkpoint=True` maps to `jax.checkpoint` (nn.remat) over stages."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(wins, ws, h, w):
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask=None):
        bw, n, c = x.shape
        h = self.heads
        hd = c // h
        qkv = nn.Dense(3 * c, use_bias=True)(x).reshape(bw, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / (hd ** 0.5)

        # relative position bias
        ws = self.window
        table = self.param(
            "rel_pos_bias", nn.initializers.normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), h),
        )
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
        flat = coords.reshape(2, -1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = (rel + ws - 1)
        idx = rel[0] * (2 * ws - 1) + rel[1]
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, h).transpose(2, 0, 1)
        att = att + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            att = att.reshape(bw // nw, nw, h, n, n) + mask[None, :, None]
            att = att.reshape(bw, h, n, n)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(bw, n, c)
        return nn.Dense(c)(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hgt, wdt, c = x.shape
        ws = self.window
        pad_h = (-hgt) % ws
        pad_w = (-wdt) % ws
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h.shape[1:3]

        shift = self.shift if min(hp, wp) > ws else 0
        if shift:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))

        mask = None
        if shift or pad_h or pad_w:
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            hs = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)) if shift else (slice(None),)
            wss = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)) if shift else (slice(None),)
            for hsl in hs:
                for wsl in wss:
                    img_mask[:, hsl, wsl, :] = cnt
                    cnt += 1
            # padded region gets its own group so it never attends in
            if pad_h:
                img_mask[:, hp - pad_h :, :, :] = cnt + 1
            if pad_w:
                img_mask[:, :, wp - pad_w :, :] = cnt + 2
            mw = _window_partition(jnp.asarray(img_mask), ws).reshape(-1, ws * ws)
            mask = jnp.where(mw[:, None, :] != mw[:, :, None], -1e9, 0.0)

        wins = _window_partition(h, ws)
        wins = WindowAttention(self.dim, self.heads, ws)(wins, mask)
        h = _window_reverse(wins, ws, hp, wp)
        if shift:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        h = h[:, :hgt, :wdt]
        x = shortcut + h
        m = nn.LayerNorm(epsilon=1e-5)(x)
        m = nn.Dense(int(c * self.mlp_ratio))(m)
        m = nn.gelu(m, approximate=False)  # MONAI/torch nn.GELU() is exact erf
        m = nn.Dense(c)(m)
        return x + m


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        return nn.Dense(2 * self.dim, use_bias=False)(x)


class ResConvBlock(nn.Module):
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


class UpBlock(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = nn.ConvTranspose(self.out, (2, 2), strides=(2, 2))(x)
        return ResConvBlock(self.out)(jnp.concatenate([x, skip], axis=-1), train)


@register_model("SWINUNETR")
class SwinUNETR(nn.Module):
    img_size: tuple = (352, 352)  # config parity; sizes are dynamic
    in_channels: int = 3
    out_channels: int = 1
    feature_size: int = 24
    depths: tuple = (2, 2, 2, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window: int = 7
    use_checkpoint: bool = True
    spatial_dims: int = 2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        fs = self.feature_size

        h = nn.Conv(fs, (2, 2), strides=(2, 2))(x)  # patch embed (patch 2)
        hidden = [h]
        dim = fs
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            blk_cls = nn.remat(SwinBlock, static_argnums=(2,)) if self.use_checkpoint else SwinBlock
            for j in range(depth):
                h = blk_cls(dim, heads, self.window, shift=0 if j % 2 == 0 else self.window // 2)(
                    h, train
                )
            h = PatchMerging(dim)(h)
            dim *= 2
            hidden.append(h)

        enc0 = ResConvBlock(fs)(x, train)
        enc1 = ResConvBlock(fs)(hidden[0], train)
        enc2 = ResConvBlock(2 * fs)(hidden[1], train)
        enc3 = ResConvBlock(4 * fs)(hidden[2], train)
        dec4 = ResConvBlock(16 * fs)(hidden[4], train)

        d3 = UpBlock(8 * fs)(dec4, ResConvBlock(8 * fs)(hidden[3], train), train)
        d2 = UpBlock(4 * fs)(d3, enc3, train)
        d1 = UpBlock(2 * fs)(d2, enc2, train)
        d0 = UpBlock(fs)(d1, enc1, train)
        out = UpBlock(fs)(d0, enc0, train)
        out = nn.Conv(self.out_channels, (1, 1))(out)
        return nhwc_to_nchw(out)
