"""TransUNet — from-scratch ViT-hybrid segmenter (reference
`/root/reference/src/TransUnet/TransUnet.py`, 288 LoC): 7x7/2 conv stem,
three EncoderBottlenecks (stride 2), a patch-1 ViT over the 1/16 feature map,
and a skip-connected conv decoder. NHWC internally; attention/MLP run as
batched einsums on the MXU."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw, resize_bilinear_align_corners
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


class MultiHeadAttention(nn.Module):
    embedding_dim: int
    head_num: int

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        h = self.head_num
        d = self.embedding_dim // h
        qkv = nn.Dense(self.embedding_dim * 3, use_bias=False)(x)
        qkv = qkv.reshape(b, t, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        # NOTE (ref parity): the reference MULTIPLIES by sqrt(d_k) instead of
        # dividing (`TransUnet.py:12,21`); reproduced as-is.
        energy = jnp.einsum("bhid,bhjd->bhij", q, k) * (d ** 0.5)
        att = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.embedding_dim)
        return nn.Dense(self.embedding_dim, use_bias=False)(out)


class TransformerEncoderBlock(nn.Module):
    embedding_dim: int
    head_num: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = MultiHeadAttention(self.embedding_dim, self.head_num)(x)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        x = nn.LayerNorm()(x + h)
        m = nn.Dense(self.mlp_dim)(x)
        m = nn.gelu(m)
        m = nn.Dropout(0.1, deterministic=not train)(m)
        m = nn.Dense(self.embedding_dim)(m)
        m = nn.Dropout(0.1, deterministic=not train)(m)
        return nn.LayerNorm()(x + m)


class ViT(nn.Module):
    img_dim: int
    in_channels: int
    embedding_dim: int
    head_num: int
    mlp_dim: int
    block_num: int
    patch_dim: int
    classification: bool = False
    num_classes: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_dim
        b, hh, ww, c = x.shape
        patches = x.reshape(b, hh // p, p, ww // p, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, (hh // p) * (ww // p), p * p * c)
        tokens = patches.shape[1]
        proj = nn.Dense(self.embedding_dim)(patches)
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.embedding_dim))
        emb = self.param(
            "embedding", nn.initializers.uniform(1.0), (tokens + 1, self.embedding_dim)
        )
        h = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), proj], axis=1) + emb[None]
        h = nn.Dropout(0.1, deterministic=not train)(h)
        for _ in range(self.block_num):
            h = TransformerEncoderBlock(self.embedding_dim, self.head_num, self.mlp_dim)(h, train)
        if self.classification:
            return nn.Dense(self.num_classes)(h[:, 0])
        return h[:, 1:]


class EncoderBottleneck(nn.Module):
    out_channels: int
    stride: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(v):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)

        down = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, self.stride),
                       use_bias=False)(x)
        down = bn(down)
        width = int(self.out_channels * (self.base_width / 64))
        h = nn.relu(bn(nn.Conv(width, (1, 1), use_bias=False)(x)))
        h = nn.relu(bn(nn.Conv(width, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)), use_bias=False)(h)))
        h = bn(nn.Conv(self.out_channels, (1, 1), use_bias=False)(h))
        return nn.relu(h + down)


class DecoderBottleneck(nn.Module):
    out_channels: int
    scale: int = 2

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = resize_bilinear_align_corners(x, (x.shape[1] * self.scale, x.shape[2] * self.scale))
        if skip is not None:
            x = jnp.concatenate([skip, x], axis=-1)
        for _ in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
        return x


@register_model("TransUNet")
class TransUNet(nn.Module):
    img_dim: int = 352
    in_channels: int = 3
    out_channels: int = 128
    head_num: int = 4
    mlp_dim: int = 512
    block_num: int = 8
    patch_dim: int = 16
    class_num: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        oc = self.out_channels

        def bn(v):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)

        h = nn.Conv(oc, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False)(x)
        x1 = nn.relu(bn(h))
        x2 = EncoderBottleneck(oc * 2, stride=2)(x1, train)
        x3 = EncoderBottleneck(oc * 4, stride=2)(x2, train)
        h = EncoderBottleneck(oc * 8, stride=2)(x3, train)

        vd = x.shape[1] // self.patch_dim
        tokens = ViT(vd, oc * 8, oc * 8, self.head_num, self.mlp_dim,
                     self.block_num, patch_dim=1)(h, train)
        h = tokens.reshape(h.shape[0], vd, vd, oc * 8)
        h = nn.relu(bn(nn.Conv(512, (3, 3), padding="SAME")(h)))

        h = DecoderBottleneck(oc * 2)(h, x3, train)
        h = DecoderBottleneck(oc)(h, x2, train)
        h = DecoderBottleneck(oc // 2)(h, x1, train)
        h = DecoderBottleneck(oc // 8)(h, None, train)
        out = nn.Conv(self.class_num, (1, 1))(h)
        return nhwc_to_nchw(out)
