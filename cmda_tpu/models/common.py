"""Shared building blocks for the model zoo (flax.linen, NHWC).

Initializers mirror the reference's init scheme (truncated-normal std 0.02
for dense layers, fan-out normal for convs, reference
mmseg/models/backbones/mix_transformer.py:324-337) so from-scratch training
matches; pretrained runs overwrite these anyway.
"""
from __future__ import annotations

import math

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


class StreamBatchNorm(nn.Module):
    """BatchNorm with optional leading stream-group axis.

    ``stream_groups=1`` matches ``nn.BatchNorm(momentum=0.9, epsilon=1e-5)``
    (same variable tree: params bn.{scale,bias}, batch_stats bn.{mean,var}).

    ``stream_groups=k`` treats the batch as k stacked stream calls through a
    *shared* decoder (the batched fast path of DAFormerFusionHead): each
    group is normalized by its own batch statistics — bitwise the same math
    as k sequential module calls (reference daformer_head.py:305-322 decodes
    image/events/fusion/ISR one after another through one shared decoder) —
    and the running stats receive the exact k-fold sequential EMA update
    r' = m^k r + (1-m) * sum_i m^(k-1-i) s_i."""
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stream_groups: int = 1):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if not train:
            mean, var = ra_mean.value, ra_var.value
            y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
                var + self.epsilon) * scale + bias
            return y.astype(self.dtype)

        g = stream_groups
        xf = x.astype(jnp.float32)
        xg = xf.reshape((g, -1) + x.shape[1:])          # [g, B/g, ..., C]
        red = tuple(range(1, xg.ndim - 1))
        gm = jnp.mean(xg, axis=red)                     # [g, C]
        shape = (g,) + (1,) * (xg.ndim - 2) + (c,)
        # single-pass E[x^2]-E[x]^2 variance, CLAMPED at 0: the raw fast
        # formula cancels catastrophically on (near-)constant inputs — e.g.
        # a 1x1 feature upsampled by the SegFormerAdapter neck — going
        # negative beyond eps and emitting NaN through rsqrt. The clamp is
        # sufficient (two-pass costs ~2% step time for nothing, docs/PERF.md):
        # cancellation error is bounded by ~mean^2 * 2^-23, below the eps=1e-5
        # floor of the rsqrt denominator for the O(1)-mean features every BN
        # here sees, and an exactly-constant input gives y == bias under both
        # forms (x - mean is exactly 0 in f32 for identical values).
        gv = jnp.maximum(
            jnp.mean(jnp.square(xg), axis=red) - jnp.square(gm), 0.0)
        y = (xg - gm.reshape(shape)) * jax.lax.rsqrt(
            gv.reshape(shape) + self.epsilon) * scale + bias
        y = y.reshape(x.shape).astype(self.dtype)
        if not self.is_initializing():
            m = self.momentum
            w = (1.0 - m) * (m ** jnp.arange(g - 1, -1, -1,
                                             dtype=jnp.float32))
            ra_mean.value = (m ** g) * ra_mean.value + jnp.tensordot(
                w, gm, axes=1)
            ra_var.value = (m ** g) * ra_var.value + jnp.tensordot(
                w, gv, axes=1)
        return y


class ConvBNReLU(nn.Module):
    """mmcv ConvModule(conv -> BN -> ReLU) equivalent, NHWC.

    ``stream_groups`` (call-time) enables the grouped-BN batched-stream
    path — see StreamBatchNorm."""
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
    def __call__(self, x, train: bool = False, stream_groups: int = 1):
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
            x = StreamBatchNorm(dtype=self.dtype, name="bn")(
                x, train, stream_groups)
        if self.use_act:
            x = nn.relu(x)
        return x
