"""Resize ops matching torch.nn.functional.interpolate semantics.

The reference stack resizes logits/features with ``F.interpolate(mode=
'bilinear', align_corners=False)`` (mmseg ``resize`` wrapper,
reference mmseg/ops/wrappers.py:9-28) and labels with nearest.  mIoU parity
hinges on matching these exactly (SURVEY.md §7.3), so:

* bilinear / align_corners=False == half-pixel sampling, which is exactly
  ``jax.image.resize(method='linear')``.
* torch nearest uses the *asymmetric* rule ``src = floor(dst * in/out)``
  (not half-pixel rounding), so we implement it with explicit gathers.

All functions take NHWC (or NHW) arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, size: tuple[int, int], align_corners: bool = False) -> jax.Array:
    """Bilinear resize of NHWC (or HWC / NHW) to spatial ``size`` (H, W)."""
    if align_corners:
        return _resize_bilinear_align_corners(x, size)
    if x.ndim == 4:
        out_shape = (x.shape[0], size[0], size[1], x.shape[3])
    elif x.ndim == 3:
        out_shape = (x.shape[0], size[0], size[1])
    else:
        raise ValueError(f"expected 3D/4D input, got {x.shape}")
    if x.shape[1] == size[0] and x.shape[2] == size[1]:
        return x
    orig_dtype = x.dtype
    # antialias=False: torch F.interpolate does not low-pass when minifying
    y = jax.image.resize(x.astype(jnp.float32), out_shape, method="linear",
                         antialias=False)
    return y.astype(orig_dtype)


def _resize_bilinear_align_corners(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """align_corners=True bilinear (corner-aligned grid), NHWC."""
    squeeze = False
    if x.ndim == 3:
        x = x[..., None]
        squeeze = True
    n, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x[..., 0] if squeeze else x

    def axis_coords(in_len, out_len):
        if out_len == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (in_len - 1) / (out_len - 1)
        return jnp.arange(out_len, dtype=jnp.float32) * scale

    ys = axis_coords(h, oh)
    xs = axis_coords(w, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]
    xf = x.astype(jnp.float32)
    top = xf[:, y0][:, :, x0] * (1 - wx) + xf[:, y0][:, :, x1] * wx
    bot = xf[:, y1][:, :, x0] * (1 - wx) + xf[:, y1][:, :, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = out.astype(x.dtype)
    return out[..., 0] if squeeze else out


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest resize matching torch F.interpolate(mode='nearest'):
    ``src_idx = floor(dst_idx * in_size / out_size)`` (asymmetric)."""
    squeeze = False
    if x.ndim == 3:
        x = x[..., None]
        squeeze = True
    n, h, w, c = x.shape
    oh, ow = size
    ys = jnp.clip((jnp.arange(oh) * h // oh), 0, h - 1)
    xs = jnp.clip((jnp.arange(ow) * w // ow), 0, w - 1)
    out = x[:, ys][:, :, xs]
    return out[..., 0] if squeeze else out
