"""dkDualNet — experimental dual-branch net with DLK large-kernel blocks and
v2 bi-Mamba attention (reference `/root/reference/src/devDualNet/devDualNet.py`,
375 LoC). The reference's Attention unpacks four Mamba outputs under
bimamba_type="v2", which the vendored module doesn't produce (SURVEY.md §2.4
quirk); here v2 returns the single combined output and it is used directly."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw
from mm_unet_tpu.models.mamba import Mamba
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


def _up(x, hw):
    return jax.image.resize(x, (x.shape[0], *hw, x.shape[-1]), method="linear")


def _gelu(x):
    return nn.gelu(x, approximate=False)  # torch nn.GELU default is exact erf


def _act(shallow):
    return _gelu if shallow else nn.silu  # Swish == SiLU


class Mlp(nn.Module):
    dim: int
    shallow: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim * 4, (1, 1))(x)
        h = nn.Conv(self.dim * 4, (3, 3), padding="SAME", feature_group_count=self.dim * 4)(h)
        h = _act(self.shallow)(h)
        return nn.Conv(self.dim, (1, 1))(h)


class DLK(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        att1 = nn.Conv(self.dim, (5, 5), padding="SAME", feature_group_count=self.dim)(x)
        att2 = nn.Conv(self.dim, (7, 7), padding=((9, 9), (9, 9)),
                       kernel_dilation=(3, 3), feature_group_count=self.dim)(att1)
        att = jnp.concatenate([att1, att2], axis=-1)
        avg = jnp.mean(att, axis=-1, keepdims=True)
        mx = jnp.max(att, axis=-1, keepdims=True)
        se = nn.Conv(2, (7, 7), padding="SAME")(jnp.concatenate([avg, mx], axis=-1))
        se = jax.nn.sigmoid(se)
        return att1 * se[..., :1] + att2 * se[..., 1:] + x


class DLKBlock(nn.Module):
    dim: int
    shallow: bool = False
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = self.param("layer_scale", nn.initializers.constant(1e-6), (self.dim,))
        scale2 = self.param("layer_scale2", nn.initializers.constant(1e-6), (self.dim,))

        def dp(h):
            if self.drop_path > 0 and train:
                keep = 1.0 - self.drop_path
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (h.shape[0], 1, 1, 1)
                ).astype(h.dtype)
                return h * mask / keep
            return h

        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = nn.Conv(self.dim, (1, 1))(h)
        h = _gelu(h)
        h = DLK(self.dim)(h)
        h = nn.Conv(self.dim, (1, 1))(h)
        x = x + dp(scale * h)

        m = nn.LayerNorm(epsilon=1e-6)(x)
        m = Mlp(self.dim, self.shallow)(m)
        return x + dp(scale2 * m)


class ConvBlock(nn.Module):
    dim: int
    shallow: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _act(self.shallow)
        for _ in range(2):
            x = nn.Conv(self.dim, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = act(x)
        return x


class MambaAttention(nn.Module):
    """Large/small-kernel scan + v2 bi-Mamba gate (`devDualNet.py:204-280`)."""

    in_dim: int
    out_dim: int
    num_slices: int = 4
    goble: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        att1 = x
        if self.goble:
            h = nn.Conv(self.in_dim, (7, 7), padding=((9, 9), (9, 9)),
                        kernel_dilation=(3, 3), feature_group_count=self.in_dim)(x)
        else:
            h = nn.Conv(self.in_dim, (5, 5), padding="SAME",
                        feature_group_count=self.in_dim)(x)
        b, hh, ww, c = h.shape
        tokens = nn.LayerNorm(epsilon=1e-5)(h.reshape(b, hh * ww, c))
        out = Mamba(d_model=c, bimamba_type="v2", nslices=self.num_slices,
                    name="mamba")(tokens)
        att2 = out.reshape(b, hh, ww, c)
        att = jnp.concatenate([att1, att2], axis=-1)
        avg = jnp.mean(att, axis=-1, keepdims=True)
        mx = jnp.max(att, axis=-1, keepdims=True)
        se = jax.nn.sigmoid(
            nn.Conv(2, (7, 7), padding="SAME")(jnp.concatenate([avg, mx], axis=-1))
        )
        out = att1 * se[..., :1] + att2 * se[..., 1:]
        return nn.Conv(self.out_dim, (3, 3), padding="SAME")(out)


class AttentionBlock(nn.Module):
    in_dim: int
    out_dim: int
    num_slices: int = 4
    shallow: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.in_dim // 2
        x0 = MambaAttention(half, self.out_dim, self.num_slices, goble=True)(
            x[..., :half], train
        )
        x1 = MambaAttention(half, self.out_dim, self.num_slices, goble=False)(
            x[..., half:], train
        )
        h = jnp.concatenate([x0, x1], axis=-1)
        return ConvBlock(self.out_dim, self.shallow)(h, train)


@register_model("dkDualNet")
class dkDualNet(nn.Module):
    in_channels: int = 3
    out_channels: int = 1
    depths: tuple = (2, 2, 2, 2)
    dims: tuple = (48, 96, 192, 384)
    kernel_size: int = 3
    out_dim: int = 64
    num_slices_list: tuple = (64, 32, 16, 8)
    drop_path_rate: float = 0.3

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)

        feats = []
        h = x
        import numpy as np

        dp_rates = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        for i in range(4):
            if i == 0:
                h = nn.Conv(self.dims[0], (7, 7), strides=(2, 2),
                            padding=((3, 3), (3, 3)))(h)
            else:
                h = nn.Conv(self.dims[i], (2, 2), strides=(2, 2))(h)
            h = nn.LayerNorm(epsilon=1e-6)(h)
            for j in range(self.depths[i]):
                h = DLKBlock(self.dims[i], shallow=(i < 2), drop_path=float(dp_rates[cur + j]))(
                    h, train
                )
            cur += self.depths[i]
            feats.append(h)

        c1, c2, c3, c4 = feats
        od = self.out_dim
        _c4 = AttentionBlock(self.dims[3], od, self.num_slices_list[3], shallow=False)(c4, train)
        _c4 = _up(_c4, c3.shape[1:3])
        _c3 = AttentionBlock(self.dims[2], od, self.num_slices_list[2], shallow=False)(c3, train)
        _c2 = AttentionBlock(self.dims[1], od, self.num_slices_list[1], shallow=True)(c2, train)

        fused = jnp.concatenate([_up(_c4, c2.shape[1:3]), _up(_c3, c2.shape[1:3])], axis=-1)
        out1 = ConvBlock(od, shallow=False)(fused, train)
        out1 = nn.Conv(self.out_channels, (1, 1), use_bias=False)(out1)

        lf = ConvBlock(od, shallow=True)(c1, train)
        hf = ConvBlock(od, shallow=True)(_c2, train)
        hf = _up(hf, lf.shape[1:3])
        out2 = jnp.concatenate([hf, lf], axis=-1)

        out1 = nn.ConvTranspose(self.out_channels, (4, 4), strides=(4, 4))(out1)
        out2 = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2))(out2)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False)(
            jnp.concatenate([out1, out2], axis=-1)
        )
        return nhwc_to_nchw(out)
