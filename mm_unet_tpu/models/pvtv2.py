"""PVTv2 (Pyramid Vision Transformer v2) backbone — shared by FCBFormer,
DuAT, PVT-CASCADE, CVC-UNETR and BMANet (reference
`/root/reference/src/FCBFormer/pvt_v2.py`, `src/DuAT/pvtv2.py` etc.):
overlapping patch embeds, spatial-reduction attention, Mix-FFN with a
depthwise 3x3. NHWC throughout; attention runs as batched einsums on the MXU.

Reference checkpoints (`pvt_v2_b2/b3.pth`) load via `load_torch_pvtv2` when a
local file exists (the build environment has no network egress, so the zoo
defaults to from-scratch init — reference behaviour minus the .pth warm
start).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class DWConv(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, H, W):
        b, n, c = x.shape
        h = x.reshape(b, H, W, c)
        h = nn.Conv(self.dim, (3, 3), padding="SAME", feature_group_count=self.dim)(h)
        return h.reshape(b, n, c)


class MixFFN(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x, H, W, train: bool = False):
        x = nn.Dense(self.hidden)(x)
        x = DWConv(self.hidden)(x, H, W)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is exact erf
        x = nn.Dense(self.out)(x)
        return x


class SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, H, W):
        b, n, c = x.shape
        h_num = self.num_heads
        hd = c // h_num
        q = nn.Dense(c, use_bias=self.qkv_bias)(x).reshape(b, n, h_num, hd)
        if self.sr_ratio > 1:
            sr = self.sr_ratio
            xr = x.reshape(b, H, W, c)
            xr = nn.Conv(c, (sr, sr), strides=(sr, sr))(xr)
            xr = xr.reshape(b, -1, c)
            xr = nn.LayerNorm(epsilon=1e-6)(xr)
        else:
            xr = x
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias)(xr).reshape(b, -1, 2, h_num, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / (hd ** 0.5)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, n, c)
        return nn.Dense(c)(out)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    sr_ratio: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, H, W, train: bool = False):
        h = SRAttention(self.dim, self.num_heads, self.sr_ratio)(
            nn.LayerNorm(epsilon=1e-6)(x), H, W
        )
        if self.drop_path > 0 and train:
            # stochastic depth: drop the whole residual branch per sample
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (x.shape[0], 1, 1)
            ).astype(h.dtype)
            h = h * mask / keep
        x = x + h
        m = MixFFN(int(self.dim * self.mlp_ratio), self.dim)(
            nn.LayerNorm(epsilon=1e-6)(x), H, W, train
        )
        return x + m


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int
    stride: int

    @nn.compact
    def __call__(self, x):
        p = self.patch
        x = nn.Conv(self.dim, (p, p), strides=(self.stride, self.stride),
                    padding=((p // 2, p // 2), (p // 2, p // 2)))(x)
        b, H, W, c = x.shape
        x = nn.LayerNorm(epsilon=1e-6)(x.reshape(b, H * W, c))
        return x, H, W


class PVTv2(nn.Module):
    """Returns the 4-level NHWC pyramid. b2: depths (3,4,6,3); b3: (3,4,18,3)."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        pyramid = []
        h = x
        for i in range(4):
            h, H, W = OverlapPatchEmbed(
                self.embed_dims[i], patch=7 if i == 0 else 3, stride=4 if i == 0 else 2
            )(h)
            for _ in range(self.depths[i]):
                h = PVTBlock(self.embed_dims[i], self.num_heads[i],
                             self.mlp_ratios[i], self.sr_ratios[i])(h, H, W, train)
            h = nn.LayerNorm(epsilon=1e-6)(h)
            h = h.reshape(h.shape[0], H, W, self.embed_dims[i])
            pyramid.append(h)
        return pyramid


def pvt_v2_b2() -> PVTv2:
    return PVTv2(depths=(3, 4, 6, 3))


def pvt_v2_b3() -> PVTv2:
    return PVTv2(depths=(3, 4, 18, 3))
