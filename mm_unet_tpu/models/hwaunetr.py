"""HWAUNETR — orphaned experimental net (reference `src/model/HWAUNETR.py`,
453 LoC; not in the factory): GMP conv blocks + MFA blocks that reuse the
tri-directional Mamba's per-direction outputs (o1/o2/o3) as q/k/v for an
L x L token attention, hierarchical downsample encoder, transposed-conv
decoder, multi-scale HWA input fusion. Provided for inventory parity."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw
from mm_unet_tpu.models.mamba import Mamba
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


def _gelu(x):
    return nn.gelu(x, approximate=False)  # torch nn.GELU default is exact erf


def _in(x):
    """torch nn.InstanceNorm2d default: affine=False, eps=1e-5."""
    return nn.InstanceNorm(use_scale=False, use_bias=False, epsilon=1e-5)(x)


def _act(shallow):
    return _gelu if shallow else nn.silu


class MlpChannel(nn.Module):
    hidden: int
    mlp_dim: int
    shallow: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mlp_dim, (1, 1))(x)
        h = _act(self.shallow)(h)
        return nn.Conv(self.hidden, (1, 1))(h)


class GMPBlock(nn.Module):
    dim: int
    shallow: bool = True

    @nn.compact
    def __call__(self, x):
        act = _act(self.shallow)
        res = x
        x1 = act(_in(nn.Conv(self.dim, (3, 3), padding="SAME")(x)))
        x1 = act(_in(nn.Conv(self.dim, (3, 3), padding="SAME")(x1)))
        x2 = act(_in(nn.Conv(self.dim, (1, 1))(x)))
        h = act(_in(nn.Conv(self.dim, (1, 1))(x1 + x2)))
        return h + res


class MFABlock(nn.Module):
    """v3 Mamba whose three directional outputs double as q/k/v for an
    L x L attention, fused with the scan output (`HWAUNETR.py:203-270`)."""

    dim: int
    num_slices: int = 4

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = nn.LayerNorm(epsilon=1e-5)(x.reshape(b, h * w, c))
        out, q, k, v = Mamba(
            d_model=c, bimamba_type="v3", nslices=self.num_slices, name="mamba"
        )(tokens)
        # q/k/v: (B, d_inner, L); attn over tokens
        att = jax.nn.softmax(jnp.einsum("bdl,bdm->blm", q, k), axis=-1)
        out_a = jnp.einsum("bdm,blm->bdl", v, att).reshape(b, -1, h, w)
        out_a = nchw_to_nhwc(out_a)
        out_a = nn.Conv(self.dim, (3, 3), padding="SAME")(out_a)
        out_m = out.reshape(b, h, w, c)
        fused = nn.Conv(self.dim, (3, 3), padding="SAME")(
            jnp.concatenate([out_a, out_m], axis=-1)
        )
        return fused + x


class HWABlock(nn.Module):
    """Multi-scale per-channel downsample/upsample fusion (`HWAUNETR.py:355-400`)."""

    in_chans: int = 4
    kernel_sizes: tuple = (1, 2, 4, 8)

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        weights = self.param("weights", nn.initializers.ones, (self.in_chans,))
        wn = jax.nn.softmax(weights)
        outs = []
        for ci in range(c):
            ch = x[..., ci : ci + 1]
            scales = []
            for ks in self.kernel_sizes:
                d = nn.Conv(1, (ks, ks), strides=(ks, ks))(ch)
                d = jax.image.resize(d, (b, h, w, 1), "nearest")
                scales.append(d)
            fused = nn.Conv(1, (3, 3), padding="SAME")(jnp.concatenate(scales, -1))
            outs.append(fused * wn[ci])
        return jnp.concatenate(outs, axis=-1)


@register_model("HWAUNETR")
class HWAUNETR(nn.Module):
    in_chans: int = 4
    out_chans: int = 3
    kernel_sizes: tuple = (4, 2, 2, 2)
    depths: tuple = (1, 1, 1, 1)
    dims: tuple = (48, 96, 192, 384)
    num_slices_list: tuple = (64, 32, 16, 8)
    hidden_size: int = 768

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        feats = []
        h = x
        for i in range(4):
            ks = self.kernel_sizes[i]
            if i > 0:
                h = _in(h)
            h = nn.Conv(self.dims[i], (ks, ks), strides=(ks, ks))(h)
            h = GMPBlock(self.dims[i], shallow=(i <= 1))(h)
            f = h
            for _ in range(self.depths[i]):
                f = MFABlock(self.dims[i], self.num_slices_list[i])(f)
            feats.append(f)
            h = _in(h)
            h = MlpChannel(self.dims[i], 2 * self.dims[i], shallow=(i < 2))(h)

        deep = nn.Conv(self.hidden_size, (2, 2), strides=(2, 2))(h)

        def tsconv(v, skip, dim_out, r):
            """TransposedConvLayer (`HWAUNETR.py:334-353`)."""
            v = nn.ConvTranspose(dim_out, (r, r), strides=(r, r))(v)
            v = nn.ConvTranspose(dim_out, (1, 1))(jnp.concatenate([v, skip], axis=-1))
            return nn.GroupNorm(num_groups=1, epsilon=1e-5)(v)

        out = tsconv(deep, feats[3], self.dims[3], 2)
        out = tsconv(out, feats[2], self.dims[2], self.kernel_sizes[3])
        out = tsconv(out, feats[1], self.dims[1], self.kernel_sizes[2])
        out = tsconv(out, feats[0], self.dims[0], self.kernel_sizes[1])
        ks0 = self.kernel_sizes[0]
        out = nn.ConvTranspose(self.out_chans, (ks0, ks0), strides=(ks0, ks0))(out)
        return nhwc_to_nchw(out)
