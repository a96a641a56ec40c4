"""VANet — CvT (convolutional transformer) encoder turned U-shaped segmenter
(reference `/root/reference/src/VANet/VANet.py` + `models/cls_cvt.py`):
conv patch embeds, attention with depthwise-conv + BN projections
(stride-2 k/v), mask-guided attention (`r` prior multiplies attention by a
normalised |r_q x r_kv| + 1 map, `cls_cvt.py:434-460`), PatchExpand decoder,
sigmoid-before-upsample output (ref parity)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import (nchw_to_nhwc, nhwc_to_nchw,
                                        resize_bilinear_align_corners,
                                        resize_bilinear_torch)
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ConvProj(nn.Module):
    """Depthwise conv + BN projection (CvT 'dw_bn')."""

    dim: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.dim, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=self.dim,
                    use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        return h


class CvTAttention(nn.Module):
    dim: int
    num_heads: int
    stride_kv: int = 1
    pool_kv: bool = False  # avg-pool k/v 2x (encoder stage2 odd blocks)
    attn_drop: float = 0.0  # on attention weights (ref cls_cvt.py:459)
    proj_drop: float = 0.0  # after output projection (ref cls_cvt.py:464)
    qkv_bias: bool = True  # yaml QKV_BIAS for CvT stages; VANet's own
    # decoder blocks use the Block default False (`VANet.py:167-199`)

    @nn.compact
    def __call__(self, x, train: bool = False, r=None):
        b, H, W, c = x.shape
        q = ConvProj(self.dim, 1)(x, train)
        k = ConvProj(self.dim, self.stride_kv)(x, train)
        v = ConvProj(self.dim, self.stride_kv)(x, train)
        if self.pool_kv:
            k = nn.avg_pool(k, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            v = nn.avg_pool(v, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        hk, wk = k.shape[1:3]

        nh = self.num_heads
        hd = self.dim // nh
        qb = self.qkv_bias
        qt = nn.Dense(self.dim, use_bias=qb)(q.reshape(b, H * W, c)).reshape(b, -1, nh, hd)
        kt = nn.Dense(self.dim, use_bias=qb)(k.reshape(b, hk * wk, c)).reshape(b, -1, nh, hd)
        vt = nn.Dense(self.dim, use_bias=qb)(v.reshape(b, hk * wk, c)).reshape(b, -1, nh, hd)
        att = jnp.einsum("blhd,bthd->bhlt", qt, kt) * (self.dim ** -0.5)
        att = jax.nn.softmax(att, axis=-1)
        if r is not None:
            alpha = self.param("alpha", nn.initializers.ones, ())
            # F.interpolate default: align_corners=False, NO antialias even
            # when downsampling (`cls_cvt.py:450-453`)
            r0 = resize_bilinear_torch(r, (H, W)).reshape(b, H * W, -1)
            r1 = resize_bilinear_torch(r, (hk, wk)).reshape(b, hk * wk, -1)
            guide = jnp.abs(jnp.einsum("bxc,byc->bxy", r0, r1))[:, None] + 1.0
            guide = guide / jnp.max(guide, axis=3, keepdims=True)
            att = alpha * guide * att
        att = nn.Dropout(self.attn_drop, deterministic=not train)(att)
        out = jnp.einsum("bhlt,bthd->blhd", att, vt).reshape(b, H * W, self.dim)
        out = nn.Dense(self.dim)(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out.reshape(b, H, W, self.dim)


def _drop_path(x, rate: float, train: bool, mod: nn.Module):
    """Stochastic depth on the residual branch (ref cls_cvt.py:567-584,
    timm DropPath): per-sample Bernoulli keep, scaled by 1/keep_prob."""
    if rate == 0.0 or not train:
        return x
    keep = 1.0 - rate
    rng = mod.make_rng("dropout")
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


class CvTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    stride_kv: int = 1
    pool_kv: bool = False
    mlp_drop: float = 0.0  # 'drop' after each MLP dense (ref cls_cvt.py:71,73)
    attn_drop: float = 0.0
    drop_path: float = 0.0  # on both residual branches (ref cls_cvt.py:583-584)
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, r=None):
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = CvTAttention(self.dim, self.num_heads, self.stride_kv, self.pool_kv,
                         self.attn_drop, self.mlp_drop, self.qkv_bias)(h, train, r)
        x = x + _drop_path(h, self.drop_path, train, self)
        m = nn.LayerNorm(epsilon=1e-5)(x)
        m = nn.Dense(int(self.dim * self.mlp_ratio))(m)
        m = quick_gelu(m)
        m = nn.Dropout(self.mlp_drop, deterministic=not train)(m)
        m = nn.Dense(self.dim)(m)
        m = nn.Dropout(self.mlp_drop, deterministic=not train)(m)
        return x + _drop_path(m, self.drop_path, train, self)


class PatchMerge(nn.Module):
    dim: int
    patch: int
    stride: int

    @nn.compact
    def __call__(self, x):
        p = self.patch
        pad = self.stride // 2 if p != 7 else 2
        x = nn.Conv(self.dim, (p, p), strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)))(x)
        return nn.LayerNorm(epsilon=1e-5)(x)


class PatchExpand(nn.Module):
    dim: int
    patch: int
    stride: int

    @nn.compact
    def __call__(self, x1, x2):
        # reference nn.Upsample(mode='bilinear') default align_corners=False
        # (`VANet.py:91`)
        x1 = jax.image.resize(
            x1,
            (x1.shape[0], x1.shape[1] * self.stride, x1.shape[2] * self.stride,
             x1.shape[3]),
            "linear",
        )
        p = self.patch
        h = nn.Conv(self.dim, (p, p), padding="SAME")(jnp.concatenate([x1, x2], -1))
        return nn.LayerNorm(epsilon=1e-5)(h)


@register_model("VANet")
class VANet(nn.Module):
    cfg: str = ""  # yacs config path (reference parity; dims given directly)
    embed_dims: tuple = (64, 192, 384)
    depths: tuple = (1, 2, 10)
    mlp_ratios: tuple = (4, 4, 4)
    num_heads: tuple = (1, 3, 6)
    strides: tuple = (4, 2, 2)
    proj_drop: float = 0.1
    attn_drop: float = 0.1
    drop_path: float = 0.1
    num_class: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        in_hw = x.shape[1:3]
        dims, heads, mr = self.embed_dims, self.num_heads, self.mlp_ratios
        dp, ad, pd = self.drop_path, self.attn_drop, self.proj_drop

        def dpr(stage, j):  # per-stage stochastic-depth decay (ref cls_cvt.py:670)
            d = self.depths[stage]
            return dp * j / (d - 1) if d > 1 else 0.0

        # encoder stage 0 / 1 (full CvT stages)
        f0 = PatchMerge(dims[0], 7, self.strides[0])(x)
        for j in range(self.depths[0]):
            f0 = CvTBlock(dims[0], heads[0], mr[0], stride_kv=2,
                          mlp_drop=pd, attn_drop=ad, drop_path=dpr(0, j))(f0, train)
        f1 = PatchMerge(dims[1], 3, self.strides[1])(f0)
        for j in range(self.depths[1]):
            f1 = CvTBlock(dims[1], heads[1], mr[1], stride_kv=2,
                          mlp_drop=pd, attn_drop=ad, drop_path=dpr(1, j))(f1, train)

        # encoder stage 2 = first half of CvT stage-2 blocks
        f = PatchMerge(dims[2], 3, self.strides[2])(f1)
        for i in range(self.depths[2] // 2):
            f = CvTBlock(dims[2], heads[2], mr[2], stride_kv=1 if i % 2 else 2,
                         pool_kv=(i % 2 == 1),
                         mlp_drop=pd, attn_drop=ad, drop_path=dpr(2, i))(f, train)
        out0 = nn.Conv(self.num_class, (3, 3), padding="SAME")(f)

        # decoder stage 0 = second half of CvT stage-2 blocks (keep their
        # yaml-derived per-depth drop_path), guided by out0
        for j in range(self.depths[2] - self.depths[2] // 2):
            f = CvTBlock(dims[2], heads[2], mr[2], stride_kv=2,
                         mlp_drop=pd, attn_drop=ad,
                         drop_path=dpr(2, self.depths[2] // 2 + j))(f, train, r=out0)
        out1 = nn.Conv(self.num_class, (3, 3), padding="SAME")(f)

        # decoder stages 1/2: freshly-built Blocks with constant rates
        # (ref VANet.py:167-199: drop=proj_drop, attn_drop, drop_path)
        f = PatchExpand(dims[1], 2 * self.strides[2] - 1, self.strides[2])(f, f1)
        for _ in range(self.depths[1]):
            f = CvTBlock(dims[1], heads[1], mr[1], stride_kv=2,
                         mlp_drop=pd, attn_drop=ad, drop_path=dp,
                         qkv_bias=False)(f, train, r=out1)
        out2 = nn.Conv(self.num_class, (3, 3), padding="SAME")(f)

        f = PatchExpand(dims[0], 2 * self.strides[1] - 1, self.strides[1])(f, f0)
        for _ in range(self.depths[0]):
            f = CvTBlock(dims[0], heads[0], mr[0], stride_kv=2,
                         mlp_drop=pd, attn_drop=ad, drop_path=dp,
                         qkv_bias=False)(f, train, r=out2)
        out3 = nn.Conv(self.num_class, (3, 3), padding="SAME")(f)

        out = jax.nn.sigmoid(out3)  # ref parity: sigmoid before upsample
        out = resize_bilinear_align_corners(out, in_hw)
        return nhwc_to_nchw(out)
