"""Shared building blocks for the model zoo (flax.linen, NHWC).

Initializers mirror the reference's init scheme (truncated-normal std 0.02
for dense layers, fan-out normal for convs, reference
mmseg/models/backbones/mix_transformer.py:324-337) so from-scratch training
matches; pretrained runs overwrite these anyway.
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

# Truncated normal with std=0.02 (timm trunc_normal_ semantics).
dense_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def conv_fanout_init(key, shape, dtype=jnp.float32):
    """Normal(0, sqrt(2 / fan_out)); shape is HWIO."""
    kh, kw, _, out_ch = shape
    fan_out = kh * kw * out_ch
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


def dwconv_fanout_init(key, shape, dtype=jnp.float32):
    """Depthwise variant: torch divides fan_out by groups (== out channels)."""
    kh, kw, _, out_ch = shape
    std = math.sqrt(2.0 / (kh * kw))
    return jax.random.normal(key, shape, dtype) * std


class DropPath(nn.Module):
    """Per-sample stochastic depth."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class ConvBNReLU(nn.Module):
    """mmcv ConvModule(conv -> BN -> ReLU) equivalent, NHWC."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    use_norm: bool = True
    use_act: bool = True
    use_bias: bool | None = None  # default: no bias when followed by BN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = (not self.use_norm) if self.use_bias is None else self.use_bias
        pad = self.dilation * (self.kernel_size // 2)
        x = nn.Conv(
            self.features, (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=bias,
            kernel_init=conv_fanout_init if self.groups == 1 else dwconv_fanout_init,
            dtype=self.dtype, name="conv")(x)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn")(x)
        if self.use_act:
            x = nn.relu(x)
        return x
