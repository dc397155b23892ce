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


@dataclass(frozen=True)
class ResNetConfig:
    depths: Sequence[int] = (3, 4, 6, 3)      # resnet50
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    base_planes: int = 64


RESNET_VARIANTS = {
    "resnet50": ResNetConfig(),
    "resnet101": ResNetConfig(depths=(3, 4, 23, 3)),
    # output-stride-8 dilated variants for DeepLab heads (V1c-d8)
    "resnet50_d8": ResNetConfig(strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4)),
    "resnet101_d8": ResNetConfig(depths=(3, 4, 23, 3), strides=(1, 2, 1, 1),
                                 dilations=(1, 1, 2, 4)),
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
        planes = c.base_planes
        for s in range(4):
            for i in range(c.depths[s]):
                x = Bottleneck(
                    planes=planes,
                    stride=c.strides[s] if i == 0 else 1,
                    dilation=c.dilations[s],
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{s + 1}_{i}")(x, train)
            outs.append(x)
            planes *= 2
        return outs
