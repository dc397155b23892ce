"""MixVisionTransformer (SegFormer MiT-b0..b5 encoder), TPU-native.

Behavioral contract: the 4-stage hierarchical ViT of the reference
(mmseg/models/backbones/mix_transformer.py:186-551): overlapping patch
embeds (7x7/s4 then 3x3/s2), spatial-reduction attention (K/V downsampled by
a strided conv with ratio sr in {8,4,2,1}), MixFFN with a 3x3 depthwise conv,
pre-norm residual blocks with stochastic depth linearly ramped to
``drop_path_rate`` over all blocks, and a LayerNorm per stage output.
Variant table (embed dims / heads / depths) matches
mix_transformer.py:458-551; b5 = depths [3, 6, 40, 3].

TPU-first design choices (not a port):
  * NHWC end-to-end; tokens kept as [B, H*W, C] between ops so stage matmuls
    hit the MXU as large [B*N, C] x [C, C'] contractions.
  * qk softmax in float32; everything else follows the module ``dtype``
    (bfloat16 for training/bench).
  * Attention uses jnp.einsum; XLA fuses scale+softmax.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import DropPath, dense_init, conv_fanout_init, dwconv_fanout_init


@dataclass(frozen=True)
class MiTConfig:
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    depths: Sequence[int] = (3, 6, 40, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1


MIT_VARIANTS = {
    # not a reference variant: one block per stage, for coordination tests
    # where compile time (1-core CPU sandbox) matters more than capacity
    "mit_micro": MiTConfig(embed_dims=(16, 32, 64, 128),
                           num_heads=(1, 2, 4, 8), depths=(1, 1, 1, 1)),
    "mit_b0": MiTConfig(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mit_b1": MiTConfig(depths=(2, 2, 2, 2)),
    "mit_b2": MiTConfig(depths=(3, 4, 6, 3)),
    "mit_b3": MiTConfig(depths=(3, 4, 18, 3)),
    "mit_b4": MiTConfig(depths=(3, 8, 27, 3)),
    "mit_b5": MiTConfig(depths=(3, 6, 40, 3)),
}


class DWConv3x3(nn.Module):
    """3x3 depthwise conv over the token grid (MixFFN positional mixing)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        b, n, c = x.shape
        h, w = hw
        y = x.reshape(b, h, w, c)
        y = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.dim, use_bias=True,
                    kernel_init=dwconv_fanout_init, dtype=self.dtype,
                    name="dwconv")(y)
        return y.reshape(b, n, c)


class MixFFN(nn.Module):
    """fc1 -> dwconv -> gelu -> fc2 (+ dropout)."""
    hidden_dim: int
    out_dim: int
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, kernel_init=dense_init,
                     dtype=self.dtype, name="fc1")(x)
        x = DWConv3x3(self.hidden_dim, dtype=self.dtype, name="dwconv")(x, hw)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = nn.Dense(self.out_dim, kernel_init=dense_init,
                     dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class SRAttention(nn.Module):
    """Multi-head attention with spatial reduction of K/V."""
    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw, deterministic: bool = True):
        b, n, c = x.shape
        h, w = hw
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        q = nn.Dense(self.dim, use_bias=self.qkv_bias, kernel_init=dense_init,
                     dtype=self.dtype, name="q")(x)
        if self.sr_ratio > 1:
            kv_in = x.reshape(b, h, w, c)
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            padding="VALID", kernel_init=conv_fanout_init,
                            dtype=self.dtype, name="sr")(kv_in)
            kv_in = kv_in.reshape(b, -1, c)
            kv_in = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name="sr_norm")(kv_in)
        else:
            kv_in = x
        kv = nn.Dense(self.dim * 2, use_bias=self.qkv_bias,
                      kernel_init=dense_init, dtype=self.dtype, name="kv")(kv_in)
        m = kv_in.shape[1]
        kv = kv.reshape(b, m, 2, self.num_heads, head_dim)
        k = kv[:, :, 0]
        v = kv[:, :, 1]
        q = q.reshape(b, n, self.num_heads, head_dim)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, kernel_init=dense_init, dtype=self.dtype,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class MiTBlock(nn.Module):
    """Pre-norm SRA + MixFFN residual block with stochastic depth."""
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    sr_ratio: int = 1
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = SRAttention(self.dim, self.num_heads, self.sr_ratio, self.qkv_bias,
                        self.attn_drop_rate, self.drop_rate, dtype=self.dtype,
                        name="attn")(y, hw, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MixFFN(self.dim * self.mlp_ratio, self.dim, self.drop_rate,
                   dtype=self.dtype, name="mlp")(y, hw, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        return x


class MiTBlockScan(nn.Module):
    """MiTBlock in (carry, x) form for nn.scan: the stochastic-depth rate
    AND the pre-drawn drop-path uniforms are *scanned inputs* (per-block
    linear ramp), so one traced block serves a whole stage — ~17x smaller
    HLO for the b5 stage 3 and the natural unit for rematerialization.

    The drop-path uniforms are drawn OUTSIDE the scan (one threefry for the
    whole stage): an in-scan ``make_rng`` serializes the loop on the TPU
    scalar unit — measured 45 ms vs 17 ms for the b5 stage-3 fwd scan
    (r3 profile, docs/PERF.md)."""
    dim: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    qkv_bias: bool
    drop_rate: float
    attn_drop_rate: float
    hw: tuple
    deterministic: bool
    dtype: jnp.dtype = jnp.float32

    def _drop_path(self, y, rate, u):
        """u: [B] pre-drawn uniforms; keep iff u < 1 - rate (== bernoulli)."""
        if self.deterministic:
            return y
        keep = (1.0 - rate).astype(jnp.float32)
        mask = (u < keep).reshape((y.shape[0],) + (1,) * (y.ndim - 1))
        scaled = y / keep.astype(y.dtype)
        return jnp.where(mask, scaled, jnp.zeros_like(y))

    @nn.compact
    def __call__(self, x, scan_in):
        drop_path_rate, u = scan_in            # u: [2, B]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = SRAttention(self.dim, self.num_heads, self.sr_ratio, self.qkv_bias,
                        self.attn_drop_rate, self.drop_rate, dtype=self.dtype,
                        name="attn")(y, self.hw, self.deterministic)
        x = x + self._drop_path(y, drop_path_rate, u[0])
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MixFFN(self.dim * self.mlp_ratio, self.dim, self.drop_rate,
                   dtype=self.dtype, name="mlp")(y, self.hw, self.deterministic)
        x = x + self._drop_path(y, drop_path_rate, u[1])
        return x, None


class OverlapPatchEmbed(nn.Module):
    patch_size: int
    stride: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size // 2
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), kernel_init=conv_fanout_init,
                    dtype=self.dtype, name="proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x, (h, w)


class MixVisionTransformer(nn.Module):
    """4-stage MiT encoder; input NHWC, returns 4 NHWC feature maps at
    strides 4/8/16/32.

    Stage blocks are driven by ``nn.scan`` over stacked parameters (one
    traced block per stage — the per-block stochastic-depth rate rides the
    scan as data). ``remat=True`` checkpoints each block, trading ~30%
    FLOPs for O(depth) activation memory."""
    cfg: MiTConfig = MiTConfig()
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"   # 'full' | 'dots' (save MXU outputs)
    # lax.scan _split_transpose: backward becomes a recompute scan plus a
    # separate transpose scan that stacks the per-block param grads
    split_transpose: bool = False
    # fully unroll short stages (depth<=6: b5 stages 1/2/4) out of the
    # scan loop: params stay STACKED (checkpoint/TP layout unchanged) but
    # XLA sees straight-line blocks, so the backward's per-block grad
    # stacking becomes concats it can schedule instead of in-loop
    # dynamic-update-slices (the 10%-of-step DUS bucket, docs/PERF.md r2
    # trace; perf experiment — VERDICT r4 item 6)
    unroll_short: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        deterministic = not train
        # stochastic depth: linear ramp over all blocks
        total = sum(cfg.depths)
        dpr = [cfg.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outs = []
        cur = 0
        for stage in range(4):
            patch = OverlapPatchEmbed(
                patch_size=7 if stage == 0 else 3,
                stride=4 if stage == 0 else 2,
                embed_dim=cfg.embed_dims[stage],
                dtype=self.dtype, name=f"patch_embed{stage + 1}")
            x, (h, w) = patch(x)
            depth = cfg.depths[stage]
            block_cls = MiTBlockScan
            if self.remat:
                # 'dots' keeps matmul outputs resident and recomputes only
                # the cheap elementwise chain — ~half the recompute FLOPs of
                # full-block remat at moderate extra HBM
                policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                          if self.remat_policy == "dots" else None)
                block_cls = nn.remat(block_cls, prevent_cse=False,
                                     policy=policy)
            ScanStage = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0, length=depth,
                unroll=depth if (self.unroll_short and depth <= 6) else 1,
                _split_transpose=self.split_transpose,
                metadata_params={nn.meta.PARTITION_NAME: None})
            stage_dpr = jnp.asarray(dpr[cur: cur + depth], jnp.float32)
            if deterministic:
                stage_u = jnp.ones((depth, 2, x.shape[0]), jnp.float32)
            else:
                # one threefry per stage, outside the scan (see MiTBlockScan)
                stage_u = jax.random.uniform(
                    self.make_rng("droppath"), (depth, 2, x.shape[0]))
            x, _ = ScanStage(
                dim=cfg.embed_dims[stage],
                num_heads=cfg.num_heads[stage],
                mlp_ratio=cfg.mlp_ratios[stage],
                sr_ratio=cfg.sr_ratios[stage],
                qkv_bias=cfg.qkv_bias,
                drop_rate=cfg.drop_rate,
                attn_drop_rate=cfg.attn_drop_rate,
                hw=(h, w), deterministic=deterministic,
                dtype=self.dtype,
                name=f"blocks{stage + 1}")(x, (stage_dpr, stage_u))
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm{stage + 1}")(x)
            x = x.reshape(x.shape[0], h, w, cfg.embed_dims[stage])
            outs.append(x)
            cur += cfg.depths[stage]
        return outs
