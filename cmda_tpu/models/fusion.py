"""Cross-modality feature-fusion modules (registry FUSION in the reference).

All take two 4-scale NHWC pyramids and return one fused pyramid.
Behavioral contract (reference mmseg/models/fusion/):
  * AttentionAvgFusion (attention_avg_fusion.py:11-62): per scale, one MiT
    block on image tokens + one on event tokens (num_heads=1, qkv_bias,
    drop_path 0.05, sr [8,4,2,1]), average the two. Default for cs2dsec I+E.
  * AttentionFusion (attention_fusion.py:11-63): per scale, channel-concat
    (2C) -> MiT block at dim 2C -> MixFFN 2C->C. Default for cs2dz I+ISR and
    as the fusion_isr module of cs2dsec.
  * AverageFusion / ConcatenateFusion / ConvertAvgFusion / FeaturesSplit:
    elementwise mean; concat + 3x3 conv; ResNet BasicBlock per stream then
    mean; difference of two BasicBlocks (content/motion split).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .common import ConvBNReLU, conv_fanout_init
from .mit import MiTBlock, MixFFN


class AttentionAvgFusion(nn.Module):
    in_channels: Sequence[int] = (64, 128, 320, 512)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    num_heads: int = 1
    drop_path_rate: float = 0.05
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_feats, events_feats, train: bool = False):
        fused = []
        for i, (fi, fe) in enumerate(zip(image_feats, events_feats)):
            b, h, w, c = fi.shape
            blk_i = MiTBlock(dim=c, num_heads=self.num_heads,
                             sr_ratio=self.sr_ratios[i], qkv_bias=True,
                             drop_path=self.drop_path_rate, dtype=self.dtype,
                             name=f"block_image{i}")
            blk_e = MiTBlock(dim=c, num_heads=self.num_heads,
                             sr_ratio=self.sr_ratios[i], qkv_bias=True,
                             drop_path=self.drop_path_rate, dtype=self.dtype,
                             name=f"block_events{i}")
            xi = blk_i(fi.reshape(b, h * w, c), (h, w), not train)
            xe = blk_e(fe.reshape(b, h * w, c), (h, w), not train)
            fused.append(((xi + xe) / 2).reshape(b, h, w, c))
        return fused


class AttentionFusion(nn.Module):
    in_channels: Sequence[int] = (64, 128, 320, 512)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    num_heads: int = 1
    drop_path_rate: float = 0.05
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_feats, events_feats, train: bool = False):
        fused = []
        for i, (fi, fe) in enumerate(zip(image_feats, events_feats)):
            b, h, w, c = fi.shape
            x = jnp.concatenate([fi, fe], axis=-1).reshape(b, h * w, 2 * c)
            x = MiTBlock(dim=2 * c, num_heads=self.num_heads,
                         sr_ratio=self.sr_ratios[i], qkv_bias=True,
                         drop_path=self.drop_path_rate, dtype=self.dtype,
                         name=f"block{i}")(x, (h, w), not train)
            x = MixFFN(hidden_dim=c, out_dim=c, dtype=self.dtype,
                       name=f"mlp{i}")(x, (h, w), not train)
            fused.append(x.reshape(b, h, w, c))
        return fused


class AverageFusion(nn.Module):
    dtype: jnp.dtype = jnp.float32

    def __call__(self, image_feats, events_feats, train: bool = False):
        return [(a + b) / 2 for a, b in zip(image_feats, events_feats)]


class ConcatenateFusion(nn.Module):
    out_channels: Sequence[int] = (64, 128, 320, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_feats, events_feats, train: bool = False):
        fused = []
        for i, (a, b) in enumerate(zip(image_feats, events_feats)):
            x = jnp.concatenate([a, b], axis=-1)
            x = nn.Conv(self.out_channels[i], (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=conv_fanout_init, dtype=self.dtype,
                        name=f"conv{i}")(x)
            fused.append(x)
        return fused


class BasicBlock(nn.Module):
    """ResNet BasicBlock (3x3 BN ReLU, 3x3 BN, residual, ReLU)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBNReLU(self.features, 3, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNReLU(self.features, 3, use_act=False, dtype=self.dtype,
                       name="conv2")(y, train)
        return nn.relu(y + identity)


class ConvertAvgFusion(nn.Module):
    in_channels: Sequence[int] = (64, 128, 320, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_feats, events_feats, train: bool = False):
        fused = []
        for i, (a, b) in enumerate(zip(image_feats, events_feats)):
            ba = BasicBlock(self.in_channels[i], dtype=self.dtype,
                            name=f"block_image{i}")(a, train)
            bb = BasicBlock(self.in_channels[i], dtype=self.dtype,
                            name=f"block_events{i}")(b, train)
            fused.append((ba + bb) / 2)
        return fused


class FeaturesSplit(nn.Module):
    """Content/motion split: difference of two BasicBlocks on one pyramid."""
    in_channels: Sequence[int] = (64, 128, 320, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_feats, train: bool = False):
        out = []
        for i, a in enumerate(image_feats):
            b1 = BasicBlock(self.in_channels[i], dtype=self.dtype,
                            name=f"block_a{i}")(a, train)
            b2 = BasicBlock(self.in_channels[i], dtype=self.dtype,
                            name=f"block_b{i}")(a, train)
            out.append(b1 - b2)
        return out


FUSION_REGISTRY = {
    "attention_avg": AttentionAvgFusion,
    "attention": AttentionFusion,
    "average": AverageFusion,
    "concatenate": ConcatenateFusion,
    "convert_avg": ConvertAvgFusion,
}


def build_fusion_module(kind: str, dtype=jnp.float32, name: str | None = None,
                        remat: bool = False):
    if kind in ("", "none", None):
        return None
    cls = FUSION_REGISTRY[kind]
    if remat:
        # __call__(self, image_feats, events_feats, train): train is arg 3
        cls = nn.remat(cls, static_argnums=(3,), prevent_cse=False)
    return cls(dtype=dtype, name=name)
