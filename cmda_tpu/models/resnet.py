"""ResNet family backbones (legacy baselines: DeepLabV2/V3+, DANet, ISANet).

Behavioral contract (reference mmseg/models/backbones/resnet.py): V1c deep
stem (three 3x3 convs), 4 stages returning NHWC pyramids; dilated variant
(strides (1,2,1,1), dilations (1,1,2,4)) gives output stride 8 for the
DeepLab heads; the classic variant strides (1,2,2,2) for FPN-style heads.
BasicBlock lives in fusion.py (shared with the fusion modules).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .common import ConvBNReLU


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBNReLU(self.planes, 1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNReLU(self.planes, 3, strides=self.stride,
                       dilation=self.dilation, dtype=self.dtype,
                       name="conv2")(y, train)
        y = ConvBNReLU(self.planes * 4, 1, use_act=False, dtype=self.dtype,
                       name="conv3")(y, train)
        if self.downsample:
            identity = ConvBNReLU(self.planes * 4, 1, strides=self.stride,
                                  use_act=False, dtype=self.dtype,
                                  name="downsample")(x, train)
        return nn.relu(y + identity)


class ResNeXtBottleneck(nn.Module):
    """Grouped-conv bottleneck (reference mmseg/models/backbones/resnext.py):
    width = planes * (base_width/64) * groups; 3x3 grouped conv."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 32
    base_width: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        y = ConvBNReLU(width, 1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNReLU(width, 3, strides=self.stride, dilation=self.dilation,
                       groups=self.groups, dtype=self.dtype,
                       name="conv2")(y, train)
        y = ConvBNReLU(self.planes * 4, 1, use_act=False, dtype=self.dtype,
                       name="conv3")(y, train)
        if self.downsample:
            identity = ConvBNReLU(self.planes * 4, 1, strides=self.stride,
                                  use_act=False, dtype=self.dtype,
                                  name="downsample")(x, train)
        return nn.relu(y + identity)


class SplitAttentionConv(nn.Module):
    """ResNeSt SplAtConv2d (reference mmseg/models/backbones/resnest.py):
    3x3 conv to channels*radix (groups*radix), radix-softmax channel
    attention over the splits."""
    channels: int
    radix: int = 2
    groups: int = 1
    stride: int = 1
    dilation: int = 1
    reduction_factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r, c = self.radix, self.channels
        y = ConvBNReLU(c * r, 3, strides=self.stride, dilation=self.dilation,
                       groups=self.groups * r, dtype=self.dtype,
                       name="conv")(x, train)
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = jnp.mean(splits.sum(axis=3), axis=(1, 2), keepdims=True)
        inter = max(c * r // self.reduction_factor, 32)
        gap = ConvBNReLU(inter, 1, groups=self.groups, dtype=self.dtype,
                         name="fc1")(gap, train)
        atten = nn.Conv(c * r, (1, 1), feature_group_count=self.groups,
                        dtype=self.dtype, name="fc2")(gap)
        atten = atten.reshape(b, 1, 1, r, c)
        # rSoftMax over the radix axis (groups folded into channels here)
        atten = nn.softmax(atten.astype(jnp.float32), axis=3).astype(y.dtype)
        return (splits * atten).sum(axis=3)


class ResNeStBottleneck(nn.Module):
    """ResNeSt bottleneck with split-attention 3x3 and avd avg-pool
    downsampling (reference resnest.py Bottleneck, avd_first=False)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 4
    radix: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        y = ConvBNReLU(width, 1, dtype=self.dtype, name="conv1")(x, train)
        y = SplitAttentionConv(width, radix=self.radix, groups=self.groups,
                               stride=1, dilation=self.dilation,
                               dtype=self.dtype, name="conv2")(y, train)
        if self.stride > 1:  # avd: 3x3 avg pool instead of strided conv
            y = nn.avg_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding=((1, 1), (1, 1)))
        y = ConvBNReLU(self.planes * 4, 1, use_act=False, dtype=self.dtype,
                       name="conv3")(y, train)
        if self.downsample:
            d = x
            if self.stride > 1:  # avg_down (V1d-style shortcut)
                d = nn.avg_pool(d, (self.stride, self.stride),
                                strides=(self.stride, self.stride))
            identity = ConvBNReLU(self.planes * 4, 1, use_act=False,
                                  dtype=self.dtype, name="downsample")(d, train)
        return nn.relu(y + identity)


@dataclass(frozen=True)
class ResNetConfig:
    depths: Sequence[int] = (3, 4, 6, 3)      # resnet50
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    base_planes: int = 64
    block: str = "bottleneck"                 # | 'resnext' | 'resnest'
    groups: int = 1
    base_width: int = 4


RESNET_VARIANTS = {
    "resnet50": ResNetConfig(),
    "resnet101": ResNetConfig(depths=(3, 4, 23, 3)),
    # output-stride-8 dilated variants for DeepLab heads (V1c-d8)
    "resnet50_d8": ResNetConfig(strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4)),
    "resnet101_d8": ResNetConfig(depths=(3, 4, 23, 3), strides=(1, 2, 1, 1),
                                 dilations=(1, 1, 2, 4)),
    # legacy exp-grid extras (reference resnext.py / resnest.py)
    "resnext101_d8": ResNetConfig(depths=(3, 4, 23, 3), strides=(1, 2, 1, 1),
                                  dilations=(1, 1, 2, 4), block="resnext",
                                  groups=32, base_width=4),
    "resnest101_d8": ResNetConfig(depths=(3, 4, 23, 3), strides=(1, 2, 1, 1),
                                  dilations=(1, 1, 2, 4), block="resnest",
                                  base_planes=128),
    "resnest50": ResNetConfig(block="resnest", base_planes=64),
    "resnext50": ResNetConfig(block="resnext", groups=32, base_width=4),
}


class ResNetV1c(nn.Module):
    """Deep-stem ResNet returning the 4 stage pyramids (NHWC)."""
    cfg: ResNetConfig = ResNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        x = x.astype(self.dtype)
        # V1c stem: 3x 3x3 convs (stride 2 first), then 3x3 maxpool stride 2
        x = ConvBNReLU(c.base_planes // 2, 3, strides=2, dtype=self.dtype,
                       name="stem0")(x, train)
        x = ConvBNReLU(c.base_planes // 2, 3, dtype=self.dtype,
                       name="stem1")(x, train)
        x = ConvBNReLU(c.base_planes, 3, dtype=self.dtype,
                       name="stem2")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        planes = 64
        block_cls = {"bottleneck": Bottleneck, "resnext": ResNeXtBottleneck,
                     "resnest": ResNeStBottleneck}[c.block]
        extra = ({"groups": c.groups, "base_width": c.base_width}
                 if c.block != "bottleneck" else {})
        for s in range(4):
            for i in range(c.depths[s]):
                x = block_cls(
                    planes=planes,
                    stride=c.strides[s] if i == 0 else 1,
                    dilation=c.dilations[s],
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{s + 1}_{i}", **extra)(x, train)
            outs.append(x)
            planes *= 2
        return outs
