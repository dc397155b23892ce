"""Numerical parity vs torch oracles built from the published formulas.

These tests construct small torch modules implementing the SegFormer/CycleGAN
math (pre-norm SRA block with spatially-reduced K/V, MixFFN with depthwise
3x3, overlap patch embed; reflect-pad resnet generator with instance norm and
ConvTranspose k3 s2 p1 op1), randomize their weights, convert with
cmda_tpu.utils.torch_import, and check our flax forward matches torch.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cmda_tpu.models.mit import MiTBlock, OverlapPatchEmbed
from cmda_tpu.models.cyclegan import ResnetGenerator
from cmda_tpu.utils.torch_import import (
    to_numpy, _convert_mit_block, _conv, _ln, convert_resnet_generator,
)

torch.manual_seed(0)


# --------------------------- torch oracles ---------------------------------

class TorchSRABlock(nn.Module):
    """Pre-norm block: x += attn(ln(x)); x += mixffn(ln(x))."""

    def __init__(self, dim, heads, sr):
        super().__init__()
        self.dim, self.heads, self.sr_ratio = dim, heads, sr
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.q = nn.Linear(dim, dim, bias=True)
        self.attn.kv = nn.Linear(dim, dim * 2, bias=True)
        self.attn.proj = nn.Linear(dim, dim)
        if sr > 1:
            self.attn.sr = nn.Conv2d(dim, dim, sr, sr)
            self.attn.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.mlp.dwconv = nn.Module()
        self.mlp.dwconv.dwconv = nn.Conv2d(dim * 4, dim * 4, 3, 1, 1,
                                           groups=dim * 4)

    def attention(self, x, H, W):
        B, N, C = x.shape
        h = self.heads
        q = self.attn.q(x).reshape(B, N, h, C // h).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            x_ = x.permute(0, 2, 1).reshape(B, C, H, W)
            x_ = self.attn.sr(x_).reshape(B, C, -1).permute(0, 2, 1)
            x_ = self.attn.norm(x_)
        else:
            x_ = x
        kv = self.attn.kv(x_).reshape(B, -1, 2, h, C // h).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * (C // h) ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.attn.proj(out)

    def mixffn(self, x, H, W):
        B, N, C = x.shape
        x = self.mlp.fc1(x)
        y = x.transpose(1, 2).view(B, -1, H, W)
        y = self.mlp.dwconv.dwconv(y).flatten(2).transpose(1, 2)
        return self.mlp.fc2(F.gelu(y))

    def forward(self, x, H, W):
        x = x + self.attention(self.norm1(x), H, W)
        x = x + self.mixffn(self.norm2(x), H, W)
        return x


@pytest.mark.parametrize("sr", [1, 2])
def test_mit_block_parity(sr):
    dim, heads, H, W = 8, 2, 8, 8
    blk = TorchSRABlock(dim, heads, sr).eval()
    x = torch.randn(2, H * W, dim)
    with torch.no_grad():
        oracle = blk(x, H, W).numpy()

    sd = to_numpy(blk.state_dict())
    ours_params = _convert_mit_block({f"t.{k}": v for k, v in sd.items()}, "t")

    mod = MiTBlock(dim=dim, num_heads=heads, sr_ratio=sr, qkv_bias=True)
    out = mod.apply({"params": ours_params}, jnp.asarray(x.numpy()), (H, W))
    np.testing.assert_allclose(np.asarray(out), oracle, atol=2e-5)


def test_patch_embed_parity():
    embed = nn.Module()
    embed.proj = nn.Conv2d(3, 16, 7, 4, 3)
    embed.norm = nn.LayerNorm(16, eps=1e-6)
    embed.eval()
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        y = embed.proj(x)
        H, W = y.shape[2:]
        oracle = embed.norm(y.flatten(2).transpose(1, 2)).numpy()

    sd = to_numpy(embed.state_dict())
    params = {"proj": _conv(sd, "proj"), "norm": _ln(sd, "norm")}
    mod = OverlapPatchEmbed(patch_size=7, stride=4, embed_dim=16)
    out, hw = mod.apply({"params": params},
                        jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    assert hw == (8, 8)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=2e-5)


def test_scanned_stage_matches_torch_block_loop():
    """A 3-block stage scanned over stacked params == torch loop of blocks."""
    import jax
    from flax import linen as fnn
    from cmda_tpu.models.mit import MiTBlockScan
    from cmda_tpu.utils.torch_import import _convert_mit_block
    import numpy as np_

    dim, heads, H, W, depth = 8, 2, 8, 8, 3
    blocks = [TorchSRABlock(dim, heads, sr=2).eval() for _ in range(depth)]
    x = torch.randn(2, H * W, dim)
    with torch.no_grad():
        y = x
        for blk in blocks:
            y = blk(y, H, W)
        oracle = y.numpy()

    stacked = jax.tree.map(
        lambda *xs: np_.stack(xs),
        *[_convert_mit_block({f"t.{k}": v for k, v in
                              to_numpy(b.state_dict()).items()}, "t")
          for b in blocks])
    Scan = fnn.scan(MiTBlockScan, variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=0, length=depth,
                    metadata_params={fnn.meta.PARTITION_NAME: None})
    mod = Scan(dim=dim, num_heads=heads, mlp_ratio=4, sr_ratio=2,
               qkv_bias=True, drop_rate=0.0, attn_drop_rate=0.0,
               hw=(H, W), deterministic=True)
    out, _ = mod.apply({"params": stacked}, jnp.asarray(x.numpy()),
                       (jnp.zeros((depth,)), jnp.ones((depth, 2, 2))))
    np.testing.assert_allclose(np.asarray(out), oracle, atol=5e-5)


# --------------------------- CycleGAN generator -----------------------------

class TorchResnetGenerator(nn.Module):
    """The published resnet generator recipe (instance norm, reflect pads)."""

    def __init__(self, input_nc=1, output_nc=1, ngf=4, n_blocks=1):
        super().__init__()
        norm = lambda c: nn.InstanceNorm2d(c, affine=False,
                                           track_running_stats=False)
        model = [nn.ReflectionPad2d(3),
                 nn.Conv2d(input_nc, ngf, 7, bias=True), norm(ngf),
                 nn.ReLU(True)]
        for i in range(2):
            m = 2 ** i
            model += [nn.Conv2d(ngf * m, ngf * m * 2, 3, 2, 1, bias=True),
                      norm(ngf * m * 2), nn.ReLU(True)]
        for i in range(n_blocks):
            model += [TorchResnetBlock(ngf * 4)]
        for i in range(2):
            m = 2 ** (2 - i)
            model += [nn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, 2, 1,
                                         output_padding=1, bias=True),
                      norm(ngf * m // 2), nn.ReLU(True)]
        model += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7),
                  nn.Tanh()]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        return self.model(x)


class TorchResnetBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        norm = lambda c: nn.InstanceNorm2d(c, affine=False,
                                           track_running_stats=False)
        self.conv_block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, bias=True),
            norm(dim), nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, bias=True),
            norm(dim))

    def forward(self, x):
        return x + self.conv_block(x)


def test_resnet_generator_parity():
    gen = TorchResnetGenerator(ngf=4, n_blocks=1).eval()
    x = torch.randn(1, 1, 32, 32)
    with torch.no_grad():
        oracle = gen(x).numpy()

    sd = to_numpy(gen.state_dict())
    variables = convert_resnet_generator(sd, n_blocks=1, norm="instance")
    mod = ResnetGenerator(output_nc=1, ngf=4, n_blocks=1, norm="instance")
    out = mod.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, oracle, atol=3e-5)
