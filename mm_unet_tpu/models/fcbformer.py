"""FCBFormer — PVTv2-b3 transformer branch + fully-convolutional branch +
prediction head (reference `/root/reference/src/FCBFormer/models.py`, 207
LoC). Upsampling uses nearest mode (reference `nn.Upsample` defaults)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_unet_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw
from mm_unet_tpu.models.pvtv2 import pvt_v2_b3
from mm_unet_tpu.models.registry import register_model

Array = jax.Array


def _up_nearest(x, hw):
    return jax.image.resize(x, (x.shape[0], *hw, x.shape[-1]), method="nearest")


class RB(nn.Module):
    """GroupNorm(32) -> SiLU -> conv, twice, with skip (`models.py:10-34`)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1))(x)
        return h + x


class FCB(nn.Module):
    """Fully convolutional UNet branch (`models.py:37-105`)."""

    min_level_channels: int = 32
    min_channel_mults: tuple = (1, 1, 2, 2, 4, 4)
    n_levels: int = 6
    n_rbs: int = 2

    @nn.compact
    def __call__(self, x):
        mc = self.min_level_channels
        h = nn.Conv(mc, (3, 3), padding="SAME")(x)
        hs = [h]
        chans = [mc]
        ch = mc
        for level in range(self.n_levels):
            mult = self.min_channel_mults[level]
            for _ in range(self.n_rbs):
                h = RB(mult * mc)(h)
                ch = mult * mc
                hs.append(h)
                chans.append(ch)
            if level != self.n_levels - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(h)
                hs.append(h)
                chans.append(ch)
        h = RB(ch)(h)
        h = RB(ch)(h)
        for level in range(self.n_levels):
            mult = self.min_channel_mults[::-1][level]
            for block in range(self.n_rbs + 1):
                skip = hs.pop()
                h = RB(mult * mc)(jnp.concatenate([h, skip], axis=-1))
                ch = mult * mc
                if level < self.n_levels - 1 and block == self.n_rbs:
                    h = _up_nearest(h, (h.shape[1] * 2, h.shape[2] * 2))
                    h = nn.Conv(ch, (3, 3), padding="SAME")(h)
        return h


class TB(nn.Module):
    """PVTv2-b3 pyramid + locality-enhance + stepwise fusion (`models.py:108-176`)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        pyramid = pvt_v2_b3()(x, train)
        quarter = (x.shape[1] // 4, x.shape[2] // 4)
        emph = []
        for level in pyramid:
            h = RB(64)(level)
            h = RB(64)(h)
            emph.append(_up_nearest(h, quarter))
        l_i = emph[-1]
        for i in range(2, -1, -1):
            l_i = RB(64)(jnp.concatenate([emph[i], l_i], axis=-1))
            l_i = RB(64)(l_i)
        return l_i


@register_model("FCBFormer")
class FCBFormer(nn.Module):
    size: int = 352
    num_class: int = 1
    model_dir: str = ""  # reference .pth warm start; unused without the file

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nchw_to_nhwc(x)
        in_hw = x.shape[1:3]
        x1 = TB()(x, train)
        x2 = FCB()(x)
        x1 = _up_nearest(x1, in_hw)
        h = jnp.concatenate([x1, x2], axis=-1)
        h = RB(64)(h)
        h = RB(64)(h)
        out = nn.Conv(self.num_class, (1, 1))(h)
        return nhwc_to_nchw(out)
