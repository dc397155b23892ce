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

# Opt-in perf lever (docs/PERF.md "fused-resize experiment"): route
# integer-factor bilinear UPSAMPLES through the fixed-phase elementwise
# form instead of jax.image.resize's dot_generals.  Numerically equivalent
# (same two-tap weights; tested to float roundoff in
# tests/test_resize_augment.py) and lowers to VPU adds that XLA can fuse
# into adjacent consumers.  Whether that helps is TOOLCHAIN-DEPENDENT:
# on the r2 sandbox it cut 2 GB of temp HBM at ~-6% time on the flagship
# batch-8 step; on the refreshed jax-0.9.0 toolchain the compiler already
# keeps the dot_general resize off the HBM peak and the phase form
# measured LARGER peaks (docs/PERF.md "batch-10 hunt").  Re-measure
# hbm_temp_gb (bench.py) before relying on it.
_FUSED_INT_UPSAMPLE = False


def set_fused_int_upsample(enabled: bool) -> None:
    """Toggle the phase-decomposed integer-factor upsample path globally.

    The flag is read at trace time, so a toggle after a function has been
    traced would otherwise silently keep serving the stale executable (the
    jit cache is keyed on avals, not this flag).  To make late toggles take
    effect rather than no-op, changing the value clears JAX's jit caches —
    the affected programs retrace on next call (the persistent XLA cache
    still makes recompiles cheap).  Wired to ``bench.py --fused-resize``
    and ``tools/train.py --fused-resize``.
    """
    global _FUSED_INT_UPSAMPLE
    enabled = bool(enabled)
    if enabled != _FUSED_INT_UPSAMPLE:
        _FUSED_INT_UPSAMPLE = enabled
        jax.clear_caches()


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
    if (_FUSED_INT_UPSAMPLE and x.ndim == 4
            and size[0] % x.shape[1] == 0 and size[1] % x.shape[2] == 0):
        return phase_upsample_bilinear(x, size)
    orig_dtype = x.dtype
    # antialias=False: torch F.interpolate does not low-pass when minifying
    y = jax.image.resize(x.astype(jnp.float32), out_shape, method="linear",
                         antialias=False)
    return y.astype(orig_dtype)


def _phase_upsample_axis(x: jax.Array, axis: int, factor: int) -> jax.Array:
    """Integer-factor half-pixel bilinear upsample along one axis.

    Every output pixel ``o = factor*i + p`` samples the input at
    ``u = i + (p + 0.5)/factor - 0.5`` (the align_corners=False grid of
    torch F.interpolate / jax.image.resize), i.e. a fixed two-tap blend of
    ``x[i]`` with its clamped left or right neighbour whose weights depend
    only on the phase ``p``.  Expressed as shifted-copy weighted adds —
    pure VPU elementwise work that XLA fuses into whatever consumes the
    result (e.g. the loss softmax), unlike jax.image.resize's dot_general
    whose output must materialize.
    """
    n = x.shape[axis]
    xf = x.astype(jnp.float32)
    # clamped neighbours (edge replication == coordinate clamping)
    first = jax.lax.slice_in_dim(xf, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(xf, n - 1, n, axis=axis)
    prev = jnp.concatenate(
        [first, jax.lax.slice_in_dim(xf, 0, n - 1, axis=axis)], axis=axis)
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(xf, 1, n, axis=axis), last], axis=axis)
    # phase offsets d_p in (-0.5, 0.5); weights on (prev, self, next)
    d = (jnp.arange(factor, dtype=jnp.float32) + 0.5) / factor - 0.5
    w_prev = jnp.maximum(-d, 0.0)
    w_next = jnp.maximum(d, 0.0)
    w_self = 1.0 - w_prev - w_next
    # broadcast weights into a new phase dim right after `axis`
    shape = [1] * (x.ndim + 1)
    shape[axis + 1] = factor
    w_prev, w_self, w_next = (w.reshape(shape)
                              for w in (w_prev, w_self, w_next))
    y = (w_prev * jnp.expand_dims(prev, axis + 1)
         + w_self * jnp.expand_dims(xf, axis + 1)
         + w_next * jnp.expand_dims(nxt, axis + 1))
    out_shape = list(x.shape)
    out_shape[axis] = n * factor
    return y.reshape(out_shape)


def phase_upsample_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """NHWC integer-factor bilinear upsample (align_corners=False) as
    fixed-phase weighted adds.  Matches ``resize_bilinear`` to float
    roundoff in both values and gradients (tests/test_resize_augment.py);
    see docs/PERF.md for when this form wins (HBM-bound) and loses
    (time-bound)."""
    fh, fw = size[0] // x.shape[1], size[1] // x.shape[2]
    if fh * x.shape[1] != size[0] or fw * x.shape[2] != size[1]:
        raise ValueError(f"{x.shape} -> {size} is not an integer upsample")
    orig_dtype = x.dtype
    y = x
    if fh > 1:
        y = _phase_upsample_axis(y, 1, fh)
    if fw > 1:
        y = _phase_upsample_axis(y, 2, fw)
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
