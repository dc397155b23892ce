"""Image Self-Residual (ISR) / "Image Motion-Extractor": the core CMDA op.

An ISR is a fake event frame computed from a single image: grayscale, shift by
``shift_pixel`` pixels along two (or four) directions, take the log-intensity
difference with a dead-zone threshold, asymmetric clip, and per-sign global
min-max renormalization to [-1, 1].

Behavioral contract (verified against the reference formulas):
  * ``get_ic``: reference mmseg/datasets/utils.py:87-105
  * ``get_image_change_from_pil``: reference mmseg/datasets/utils.py:108-152
  * shift_pixel-dependent clip scaling: the reference halves the clip range
    for shift_pixel==1 and doubles it for shift_pixel==5 **only in the legacy
    day/night presets** which are commented out; the live code path takes
    ``_clip_range`` verbatim. We mirror the live path.
  * PIL ``convert('L')`` grayscale: fixed-point ITU-R 601-2
    ``(19595 R + 38470 G + 7471 B + 0x8000) >> 16``.

Unlike the reference (host-side numpy/PIL per sample, incl. a CPU round-trip
in the middle of the train step, reference mmseg/models/uda/dacs.py:729-755),
this is a pure jnp function usable both in the input pipeline and *inside*
the jitted train step, batched over the device batch.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .normalize import normalize_to_range

# The four diagonal shift-direction combos used by shift_type='random'
# (reference mmseg/models/uda/dacs.py:736-738): [row_dir, col_dir] where
# row in {left, right}, col in {up, down}.
SHIFT_DIRECTIONS = ("leftdown", "leftup", "rightdown", "rightup")


def pil_grayscale(rgb_uint8: jax.Array) -> jax.Array:
    """PIL Image.convert('L') equivalent on a (..., 3) uint8 RGB array.

    PIL uses fixed-point L = (19595 R + 38470 G + 7471 B + 0x8000) >> 16.
    Returns uint8 (...,).
    """
    r = rgb_uint8[..., 0].astype(jnp.uint32)
    g = rgb_uint8[..., 1].astype(jnp.uint32)
    b = rgb_uint8[..., 2].astype(jnp.uint32)
    l24 = 19595 * r + 38470 * g + 7471 * b + 0x8000
    return (l24 >> 16).astype(jnp.uint8)


def get_ic(front: jax.Array, now: jax.Array, val_range, threshold: float,
           clip_range: float) -> jax.Array:
    """Log-intensity change between two grayscale frames, in [-1, 1].

    ``front``/``now``: float or uint8 arrays of 0..255 gray values (H, W).
    ``val_range``: (lo, hi) of the log-domain remap.
    The dead-zone threshold and clip are fractions of log(hi) - log(lo).
    Positive and negative parts are *independently* min-max normalized over
    the whole frame to [0, 1] and [-1, 0] then summed.
    """
    lo, hi = float(val_range[0]), float(val_range[1])
    a = jnp.log(front.astype(jnp.float32) / 255.0 * (hi - lo) + lo)
    b = jnp.log(now.astype(jnp.float32) / 255.0 * (hi - lo) + lo)
    d = b - a
    log_span = math.log(hi) - math.log(lo)
    thr = log_span * threshold
    clip = log_span * clip_range
    d = jnp.where(jnp.abs(d) <= thr, 0.0, d)
    pos = jnp.clip(jnp.maximum(d, 0.0), 0.0, clip)
    pos = normalize_to_range(pos, 0.0, 1.0)
    neg = jnp.clip(jnp.minimum(d, 0.0), -clip, 0.0)
    neg = normalize_to_range(neg, -1.0, 0.0)
    return pos + neg


def _shift_row(gray: jax.Array, shift: int, left: jax.Array) -> jax.Array:
    """Shift columns by `shift` px, replicating the border slab (traced bool
    `left` selects direction). Mirrors the reference's concatenation trick."""
    w = gray.shape[-1]
    # right: concat(gray[:, :s], gray[:, :w-s])  == shift content right
    right_v = jnp.concatenate([gray[..., :shift], gray[..., : w - shift]], axis=-1)
    # left: concat(gray[:, s:], gray[:, w-s:])   == shift content left
    left_v = jnp.concatenate([gray[..., shift:], gray[..., w - shift:]], axis=-1)
    return jnp.where(left, left_v, right_v)


def _shift_col(gray: jax.Array, shift: int, up: jax.Array) -> jax.Array:
    h = gray.shape[-2]
    down_v = jnp.concatenate([gray[..., :shift, :], gray[..., : h - shift, :]], axis=-2)
    up_v = jnp.concatenate([gray[..., shift:, :], gray[..., h - shift:, :]], axis=-2)
    return jnp.where(up, up_v, down_v)


def image_change_from_gray(gray: jax.Array, *, val_range, threshold: float,
                           clip_range: float, shift_pixel: int = 1,
                           shift_direction: str | None = "rightdown",
                           direction_idx: jax.Array | None = None) -> jax.Array:
    """ISR from a grayscale frame (H, W) -> float (H, W) in [-1, 1].

    ``shift_direction``: 'all' averages 4 directions; otherwise a combo of
    {left,right} x {up,down}. Pass ``direction_idx`` (traced int32 in [0, 4))
    to select one of SHIFT_DIRECTIONS at runtime (used for
    shift_type='random' inside the jitted train step).
    """
    ic = partial(get_ic, gray, val_range=val_range, threshold=threshold,
                 clip_range=clip_range)
    if shift_direction == "all":
        assert direction_idx is None
        out = (ic(_shift_col(gray, shift_pixel, jnp.asarray(True)))
               + ic(_shift_row(gray, shift_pixel, jnp.asarray(True)))
               + ic(_shift_col(gray, shift_pixel, jnp.asarray(False)))
               + ic(_shift_row(gray, shift_pixel, jnp.asarray(False)))) / 4.0
        return out
    if direction_idx is not None:
        left = direction_idx < 2            # {0,1} = left*, {2,3} = right*
        up = (direction_idx % 2) == 1       # {1,3} = *up,  {0,2} = *down
    else:
        left = jnp.asarray("left" in shift_direction)
        up = jnp.asarray("up" in shift_direction)
    row = ic(_shift_row(gray, shift_pixel, left))
    col = ic(_shift_col(gray, shift_pixel, up))
    return row / 2.0 + col / 2.0


def image_to_isr(rgb01: jax.Array, *, val_range, threshold: float,
                 clip_range: float, shift_pixel: int = 1,
                 shift_direction: str | None = "rightdown",
                 direction_idx: jax.Array | None = None,
                 quantize: bool = True) -> jax.Array:
    """Full image->ISR chain for a single [0,1] RGB frame (H, W, 3).

    With ``quantize=True`` the frame is first converted to uint8 + PIL-exact
    grayscale, matching the reference's PIL round-trip
    (reference mmseg/models/uda/dacs.py:730-744) bit-for-bit in the gray
    domain. Returns (H, W) in [-1, 1].
    """
    if quantize:
        rgb_u8 = jnp.clip(rgb01 * 255.0, 0, 255).astype(jnp.uint8)
        gray = pil_grayscale(rgb_u8).astype(jnp.float32)
    else:
        gray = (rgb01[..., 0] * 0.299 + rgb01[..., 1] * 0.587
                + rgb01[..., 2] * 0.114) * 255.0
    return image_change_from_gray(
        gray, val_range=val_range, threshold=threshold, clip_range=clip_range,
        shift_pixel=shift_pixel, shift_direction=shift_direction,
        direction_idx=direction_idx)
