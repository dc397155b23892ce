"""Pallas TPU kernels for the event/ISR hot path.

``pallas_batched_isr`` fuses the whole per-image ISR chain — border-
replicated shift (runtime direction), log remap, difference, dead zone,
per-sign clip, global min/max reductions and renormalization, two-direction
average — into ONE VMEM-resident kernel per image (grid over the batch).
The pure-XLA version round-trips HBM several times for the same math; the
kernel reads the grayscale frame once and writes the ISR once.

Used by the DACS train step's mixed-ISR recompute (the op the reference
bounces through PIL on the CPU, reference mmseg/models/uda/dacs.py:729-755).
Numerics match cmda_tpu.ops.isr.image_change_from_gray (golden-tested, incl.
interpret mode on CPU).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_rows(g, s, left):
    w = g.shape[-1]
    right_v = jnp.concatenate([g[:, :s], g[:, : w - s]], axis=1)
    left_v = jnp.concatenate([g[:, s:], g[:, w - s:]], axis=1)
    return jnp.where(left, left_v, right_v)


def _shift_cols(g, s, up):
    h = g.shape[-2]
    down_v = jnp.concatenate([g[:s, :], g[: h - s, :]], axis=0)
    up_v = jnp.concatenate([g[s:, :], g[h - s:, :]], axis=0)
    return jnp.where(up, up_v, down_v)


def _ic(g, shifted, lo, hi, thr, clip):
    k = (hi - lo) / 255.0
    d = jnp.log(shifted * k + lo) - jnp.log(g * k + lo)
    d = jnp.where(jnp.abs(d) <= thr, 0.0, d)
    pos = jnp.clip(jnp.maximum(d, 0.0), 0.0, clip)
    pos_min = jnp.min(pos)
    pos_max = jnp.max(pos)
    pos = (pos - pos_min) / (pos_max - pos_min + 1e-8)
    neg = jnp.clip(jnp.minimum(d, 0.0), -clip, 0.0)
    neg_min = jnp.min(neg)
    neg_max = jnp.max(neg)
    neg = (neg - neg_min) / (neg_max - neg_min + 1e-8) - 1.0
    return pos + neg


def _isr_kernel(dir_ref, gray_ref, out_ref, *, lo, hi, thr, clip, shift):
    b = pl.program_id(0)
    d = dir_ref[b]
    left = d < 2
    up = (d % 2) == 1
    g = gray_ref[:]
    row = _ic(g, _shift_rows(g, shift, left), lo, hi, thr, clip)
    col = _ic(g, _shift_cols(g, shift, up), lo, hi, thr, clip)
    out_ref[:] = row * 0.5 + col * 0.5


def pallas_batched_isr(gray: jax.Array, direction_idx: jax.Array, *,
                       val_range, threshold: float, clip_range: float,
                       shift_pixel: int = 1,
                       interpret: bool = False) -> jax.Array:
    """gray [B, H, W] float32 (0..255); direction_idx [B] int32 in [0, 4)
    (leftdown/leftup/rightdown/rightup) -> ISR [B, H, W] in [-1, 1]."""
    b, h, w = gray.shape
    lo, hi = float(val_range[0]), float(val_range[1])
    span = math.log(hi) - math.log(lo)
    kernel = partial(_isr_kernel, lo=lo, hi=hi, thr=span * threshold,
                     clip=span * clip_range, shift=shift_pixel)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((None, h, w), lambda i, d: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, h, w), lambda i, d: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(direction_idx.astype(jnp.int32), gray.astype(jnp.float32))
