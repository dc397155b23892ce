"""Legacy decode heads (reference mmseg/models/decode_heads/: SegFormerHead,
FCNHead, ASPPHead, DepthwiseSeparableASPPHead, PSPHead, UPerHead, DLV2Head).

These power the non-CMDA baselines of the reference's experiment grid
(experiments.py architecture table). All NHWC; BN via ConvBNReLU; classifier
= Dropout2d(0.1) + 1x1 conv like the DAFormer head.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .common import ConvBNReLU, dense_init
from .daformer import Classifier, SepConvBNReLU
from ..ops.resize import resize_bilinear


@dataclass(frozen=True)
class HeadConfig:
    in_channels: Sequence[int] = (64, 128, 320, 512)
    channels: int = 256
    num_classes: int = 19
    dropout_ratio: float = 0.1


class SegFormerHead(nn.Module):
    """Per-scale linear embed -> upsample -> concat -> 1x1 fuse -> cls
    (the original SegFormer decoder; reference segformer_head.py)."""
    cfg: HeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        target = feats[0].shape[1:3]
        embeds = []
        for i, f in enumerate(feats):
            e = nn.Dense(self.cfg.channels, kernel_init=dense_init,
                         dtype=self.dtype, name=f"embed{i}")(f)
            embeds.append(resize_bilinear(e, target))
        x = jnp.concatenate(embeds[::-1], axis=-1)
        x = ConvBNReLU(self.cfg.channels, 1, dtype=self.dtype,
                       name="fuse")(x, train)
        return Classifier(self.cfg.num_classes, self.cfg.dropout_ratio,
                          dtype=self.dtype, name="cls")(x, deterministic=not train)


class FCNHead(nn.Module):
    """num_convs 3x3 conv stack on the selected feature (reference fcn_head)."""
    cfg: HeadConfig
    num_convs: int = 2
    in_index: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[self.in_index]
        for i in range(self.num_convs):
            x = ConvBNReLU(self.cfg.channels, 3, dtype=self.dtype,
                           name=f"conv{i}")(x, train)
        return Classifier(self.cfg.num_classes, self.cfg.dropout_ratio,
                          dtype=self.dtype, name="cls")(x, deterministic=not train)


class ASPPHead(nn.Module):
    """ASPP with image pool (reference aspp_head.py); sep=True uses
    depthwise-separable dilated branches (sep_aspp_head.py) and fuses the
    stride-4 c1 feature like DeepLabV3+."""
    cfg: HeadConfig
    dilations: Sequence[int] = (1, 12, 24, 36)
    sep: bool = False
    c1_channels: int = 0
    in_index: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[self.in_index]
        branches = []
        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = ConvBNReLU(self.cfg.channels, 1, dtype=self.dtype,
                          name="image_pool")(pool, train)
        branches.append(jnp.broadcast_to(
            pool, x.shape[:3] + (self.cfg.channels,)))
        for i, d in enumerate(self.dilations):
            if d == 1:
                y = ConvBNReLU(self.cfg.channels, 1, dtype=self.dtype,
                               name=f"aspp{i}")(x, train)
            elif self.sep:
                y = SepConvBNReLU(self.cfg.channels, 3, dilation=d,
                                  dtype=self.dtype, name=f"aspp{i}")(x, train)
            else:
                y = ConvBNReLU(self.cfg.channels, 3, dilation=d,
                               dtype=self.dtype, name=f"aspp{i}")(x, train)
            branches.append(y)
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.cfg.channels, 3, dtype=self.dtype,
                       name="bottleneck")(y, train)
        if self.c1_channels > 0:
            c1 = ConvBNReLU(self.c1_channels, 1, dtype=self.dtype,
                            name="c1_bottleneck")(feats[0], train)
            y = resize_bilinear(y, c1.shape[1:3])
            y = jnp.concatenate([y, c1], axis=-1)
            y = SepConvBNReLU(self.cfg.channels, 3, dtype=self.dtype,
                              name="sep_fuse0")(y, train)
            y = SepConvBNReLU(self.cfg.channels, 3, dtype=self.dtype,
                              name="sep_fuse1")(y, train)
        return Classifier(self.cfg.num_classes, self.cfg.dropout_ratio,
                          dtype=self.dtype, name="cls")(y, deterministic=not train)


class PSPHead(nn.Module):
    """Pyramid pooling head (reference psp_head.py), pool scales 1/2/3/6."""
    cfg: HeadConfig
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    in_index: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[self.in_index]
        h, w = x.shape[1:3]
        outs = [x]
        for i, s in enumerate(self.pool_scales):
            ph, pw = max(h // s, 1), max(w // s, 1)
            pooled = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            pooled = ConvBNReLU(self.cfg.channels, 1, dtype=self.dtype,
                                name=f"pool{i}")(pooled, train)
            outs.append(resize_bilinear(pooled, (h, w)))
        y = jnp.concatenate(outs, axis=-1)
        y = ConvBNReLU(self.cfg.channels, 3, dtype=self.dtype,
                       name="bottleneck")(y, train)
        return Classifier(self.cfg.num_classes, self.cfg.dropout_ratio,
                          dtype=self.dtype, name="cls")(y, deterministic=not train)


class UPerHead(nn.Module):
    """FPN + PPM head (reference uper_head.py)."""
    cfg: HeadConfig
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # PPM on the last stage
        x = feats[-1]
        h, w = x.shape[1:3]
        ppm = [x]
        for i, s in enumerate(self.pool_scales):
            ph, pw = max(h // s, 1), max(w // s, 1)
            pooled = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            pooled = ConvBNReLU(self.cfg.channels, 1, dtype=self.dtype,
                                name=f"ppm{i}")(pooled, train)
            ppm.append(resize_bilinear(pooled, (h, w)))
        top = ConvBNReLU(self.cfg.channels, 3, dtype=self.dtype,
                         name="ppm_bottleneck")(
            jnp.concatenate(ppm, axis=-1), train)
        # FPN top-down
        laterals = [ConvBNReLU(self.cfg.channels, 1, dtype=self.dtype,
                               name=f"lateral{i}")(f, train)
                    for i, f in enumerate(feats[:-1])] + [top]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], laterals[i - 1].shape[1:3])
        fpn = [ConvBNReLU(self.cfg.channels, 3, dtype=self.dtype,
                          name=f"fpn{i}")(laterals[i], train)
               for i in range(len(laterals) - 1)] + [laterals[-1]]
        size = fpn[0].shape[1:3]
        fused = jnp.concatenate(
            [resize_bilinear(f, size) for f in fpn], axis=-1)
        y = ConvBNReLU(self.cfg.channels, 3, dtype=self.dtype,
                       name="fpn_bottleneck")(fused, train)
        return Classifier(self.cfg.num_classes, self.cfg.dropout_ratio,
                          dtype=self.dtype, name="cls")(y, deterministic=not train)


class _QKVAttention(nn.Module):
    """mmseg SelfAttentionBlock core (mmseg/models/utils/self_attention_block
    .py semantics as used by ISA/DA): 1x1-projected q/k/v over flattened
    positions, softmax(q·kᵀ[·scale]), out = attn·v. NHWC."""
    channels: int            # q/k projection width
    out_channels: int
    key_query_num_convs: int = 2
    key_query_norm: bool = True
    matmul_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape

        def project(name, inp):
            y = inp
            for i in range(self.key_query_num_convs):
                if self.key_query_norm:
                    y = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                                   name=f"{name}{i}")(y, train)
                else:
                    y = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                                name=f"{name}{i}")(y)
            return y.reshape(b, h * w, -1)

        q = project("query", x)
        k = project("key", x)
        v = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="value")(x).reshape(b, h * w, -1)
        sim = jnp.einsum("bnc,bmc->bnm", q, k)
        if self.matmul_norm:
            sim = sim * (self.channels ** -0.5)
        attn = nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bnm,bmc->bnc", attn, v)
        return out.reshape(b, h, w, self.out_channels)


class ISACore(nn.Module):
    """Interlaced Sparse Self-Attention core (reference isa_head.py:66-160
    ISALayer body): global relation over the glb grid (one attention per
    local offset), local relation within each glb cell."""
    isa_channels: int
    down_factor: tuple = (8, 8)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        loc_h, loc_w = self.down_factor
        glb_h = -(-h // loc_h)
        glb_w = -(-w // loc_w)
        pad_h, pad_w = glb_h * loc_h - h, glb_w * loc_w - w
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                            (pad_w // 2, pad_w - pad_w // 2), (0, 0)))

        def attention(name, y):
            blk = _QKVAttention(self.isa_channels, c, dtype=self.dtype,
                                name=name)
            y = blk(y, train)
            return ConvBNReLU(c, 1, dtype=self.dtype,
                              name=f"{name}_out")(y, train)

        # global: gather (glb_h, glb_w) grids per local offset
        x = x.reshape(n, glb_h, loc_h, glb_w, loc_w, c)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            n * loc_h * loc_w, glb_h, glb_w, c)
        x = attention("global_relation", x)
        # local: gather (loc_h, loc_w) cells per global position
        x = x.reshape(n, loc_h, loc_w, glb_h, glb_w, c)
        x = x.transpose(0, 3, 4, 1, 2, 5).reshape(
            n * glb_h * glb_w, loc_h, loc_w, c)
        x = attention("local_relation", x)
        x = x.reshape(n, glb_h, glb_w, loc_h, loc_w, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, glb_h * loc_h, glb_w * loc_w, c)
        if pad_h or pad_w:
            x = x[:, pad_h // 2: pad_h // 2 + h, pad_w // 2: pad_w // 2 + w]
        return x


class ISALayer(nn.Module):
    """ISALayer as used by the DAFormer 'isa' fuse type
    (reference isa_head.py:66-160 with in_conv + out_cat_and_conv)."""
    channels: int
    isa_channels: int = 64
    down_factor: tuple = (8, 8)
    out_cat_and_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                       name="in_conv")(x, train)
        residual = x
        x = ISACore(self.isa_channels, self.down_factor, dtype=self.dtype,
                    name="core")(x, train)
        if self.out_cat_and_conv:
            x = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                           name="out_conv")(
                jnp.concatenate([x, residual], axis=-1), train)
        return x


class ISAHead(nn.Module):
    """Interlaced Sparse Self-Attention head (reference isa_head.py:163-250):
    3x3 in_conv, interlaced global+local relation, concat with the residual,
    1x1 out_conv, classifier. ``down_factor`` = local group size."""
    cfg: HeadConfig
    isa_channels: int = 256
    down_factor: tuple = (8, 8)
    in_index: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = ConvBNReLU(self.cfg.channels, 3, dtype=self.dtype,
                       name="in_conv")(feats[self.in_index], train)
        residual = x
        x = ISACore(self.isa_channels, self.down_factor, dtype=self.dtype,
                    name="core")(x, train)
        x = ConvBNReLU(self.cfg.channels, 1, dtype=self.dtype, name="out_conv")(
            jnp.concatenate([x, residual], axis=-1), train)
        return Classifier(self.cfg.num_classes, self.cfg.dropout_ratio,
                          dtype=self.dtype, name="cls")(x, deterministic=not train)


class DAHead(nn.Module):
    """Dual Attention head (reference da_head.py:78-180): position attention
    (PAM, gamma-scaled residual) + channel attention (CAM) branches, summed;
    returns the pam_cam logits (the stream mmseg evaluates)."""
    cfg: HeadConfig
    pam_channels: int = 64
    in_index: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[self.in_index]
        ch = self.cfg.channels

        # PAM branch
        p = ConvBNReLU(ch, 3, dtype=self.dtype, name="pam_in_conv")(x, train)
        attn_out = _QKVAttention(self.pam_channels, ch,
                                 key_query_num_convs=1, key_query_norm=False,
                                 matmul_norm=False, dtype=self.dtype,
                                 name="pam")(p, train)
        gamma_p = self.param("pam_gamma", nn.initializers.zeros, ())
        p = gamma_p * attn_out + p
        p = ConvBNReLU(ch, 3, dtype=self.dtype, name="pam_out_conv")(p, train)

        # CAM branch (channel-by-channel attention, reference da_head.py:52-74)
        q = ConvBNReLU(ch, 3, dtype=self.dtype, name="cam_in_conv")(x, train)
        b, h, w, c = q.shape
        flat = q.reshape(b, h * w, c)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat)
        energy = (jnp.max(energy, axis=-1, keepdims=True) - energy)
        attn = nn.softmax(energy.astype(jnp.float32), axis=-1).astype(q.dtype)
        cam_out = jnp.einsum("bcd,bnd->bnc", attn, flat).reshape(b, h, w, c)
        gamma_c = self.param("cam_gamma", nn.initializers.zeros, ())
        q = gamma_c * cam_out + q
        q = ConvBNReLU(ch, 3, dtype=self.dtype, name="cam_out_conv")(q, train)

        fused = p + q
        return Classifier(self.cfg.num_classes, self.cfg.dropout_ratio,
                          dtype=self.dtype, name="cls")(fused,
                                                        deterministic=not train)


class DLV2Head(nn.Module):
    """DeepLabV2 multi-dilation sum head (reference dlv2_head.py): parallel
    dilated 3x3 classifiers summed, no BN, no dropout."""
    cfg: HeadConfig
    dilations: Sequence[int] = (6, 12, 18, 24)
    in_index: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[self.in_index]
        out = None
        for i, d in enumerate(self.dilations):
            y = nn.Conv(self.cfg.num_classes, (3, 3),
                        padding=((d, d), (d, d)), kernel_dilation=(d, d),
                        dtype=jnp.float32, name=f"branch{i}")(
                x.astype(jnp.float32))
            out = y if out is None else out + y
        return out


class SegFormerAdapter(nn.Module):
    """The one neck the reference exp grid uses (reference
    mmseg/models/necks/segformer_adapter.py, wired by 'sfa_' architectures,
    experiments.py:134-135): upsample the selected stages by their scale
    factors and concat them into the LAST feature slot; earlier slots pass
    through (so e.g. dlv3p's c1 path still sees the stride-4 feature).
    Parameter-free."""
    out_layers: Sequence[int] = (3,)
    scales: Sequence[int] = (4,)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cat = []
        for i, s in zip(self.out_layers, self.scales):
            x = feats[i]
            if s != 1:
                x = resize_bilinear(x, (x.shape[1] * s, x.shape[2] * s))
            cat.append(x)
        out = list(feats)
        out[-1] = jnp.concatenate(cat, axis=-1)
        return out
