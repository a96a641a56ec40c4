"""ResNet encoders (NHWC) — torchvision-shaped resnet34 stages used as the
UM_Net encoder (reference `src/UM_Net/UM_Net.py:433-441`: conv1/bn/relu,
maxpool, layer1..4 at 64/128/256/512). Also provides Res2Net-style bottleneck
stages for CFANet (reference `src/CFANet/CFANet.py:13-263`).

Pretrained torchvision weights are not bundled (zero-egress environment);
encoders train from scratch, and `load_torch_resnet34` converts a local
torchvision state_dict when one is available.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(v):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)

        out = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False)(x)
        out = nn.relu(bn(out))
        out = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(out)
        out = bn(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False)(x)
            x = bn(x)
        return nn.relu(out + x)


class ResNet34Encoder(nn.Module):
    """Returns (e1 pre-pool stem, layer1, layer2, layer3, layer4)."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        e1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                     use_bias=False)(x)  # torch pad 3 (SAME would pad (2,3))
        e1 = nn.BatchNorm(use_running_average=not train, momentum=0.9)(e1)
        e1 = nn.relu(e1)
        h = nn.max_pool(e1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for i, (n, wdt) in enumerate(zip(self.blocks, self.widths)):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                h = BasicBlock(wdt, stride)(h, train)
            feats.append(h)
        return (e1, *feats)


class Bottle2neck(nn.Module):
    """Res2Net bottleneck (scale-split hierarchical 3x3s) — CFANet backbone
    (reference `CFANet.py:13-110`)."""

    features: int  # planes
    stride: int = 1
    scale: int = 4
    base_width: int = 26
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(v):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)

        per = int(self.features * (self.base_width / 64.0))  # width per split
        width = per * self.scale
        out = nn.Conv(width, (1, 1), use_bias=False)(x)
        out = nn.relu(bn(out))
        splits = [out[..., i * per : (i + 1) * per] for i in range(self.scale)]
        ys = []
        sp = None
        for i in range(self.scale - 1):
            sp = splits[i] if (i == 0 or self.downsample) else sp + splits[i]
            sp = nn.Conv(per, (3, 3), strides=(self.stride, self.stride),
                         padding=((1, 1), (1, 1)), use_bias=False)(sp)
            sp = nn.relu(bn(sp))
            ys.append(sp)
        last = splits[-1]
        if self.downsample:
            # 'stage' blocks 3x3-avg-pool the untouched last split even at
            # stride 1 (reference CFANet.py:179,218-219)
            last = nn.avg_pool(last, (3, 3), strides=(self.stride, self.stride),
                               padding=((1, 1), (1, 1)))
        ys.append(last)
        out = jnp.concatenate(ys, axis=-1)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False)(out)
        out = bn(out)
        if self.downsample or x.shape[-1] != self.features * 4:
            # v1b shortcut: avg-pool then stride-1 1x1 conv + BN
            # (reference CFANet.py:118-125)
            if self.stride > 1:
                x = nn.avg_pool(x, (self.stride, self.stride),
                                strides=(self.stride, self.stride))
            x = nn.Conv(self.features * 4, (1, 1), use_bias=False)(x)
            x = bn(x)
        return nn.relu(out + x)


class Res2Net50Encoder(nn.Module):
    """Deep-stem Res2Net-50 (CFANet's `Res2Net_model`, `CFANet.py:82-147`):
    returns (x0 post-maxpool 64ch@1/4, layer1 256@1/4, layer2 512@1/8,
    layer3 1024@1/16, layer4 2048@1/32)."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(v):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)

        h = nn.relu(bn(nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                               use_bias=False)(x)))
        h = nn.relu(bn(nn.Conv(32, (3, 3), padding="SAME", use_bias=False)(h)))
        h = nn.relu(bn(nn.Conv(64, (3, 3), padding="SAME", use_bias=False)(h)))
        x0 = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        h = x0
        for i, (n, wdt) in enumerate(zip(self.blocks, self.widths)):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                h = Bottle2neck(wdt, stride, downsample=(j == 0))(h, train)
            feats.append(h)
        return (x0, *feats)
