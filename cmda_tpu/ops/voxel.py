"""Event-camera voxel grid: trilinear splat + adaptive normalization.

Behavioral contract (verified against the reference):
  * ``events_to_voxel_grid``: reference mmseg/datasets/dsec.py:26-70 —
    bilinear splat of (t, x, y, p) events into a (num_bins, H, W) grid,
    value 2p-1, trilinear weights over the 8 (x, y, t) corner cells,
    accumulated with ``put_(accumulate=True)``.
  * ``events_norm``: reference mmseg/datasets/dsec.py:81-121 — standardize
    over nonzero cells, then clip to ±clip_range and per-sign global min-max
    renormalize to [-1, 1] (the ``enforce_no_events_zero`` path used by the
    DSEC loader, reference mmseg/datasets/dsec.py:359-365, with the adaptive
    clip ``(n_events / 500000) * 1.5`` from reference mmseg/datasets/dsec.py:362).

TPU-native design: the event stream arrives as fixed-capacity padded arrays
(count in a scalar), so the whole op has static shapes and jits once.  The
scatter-add lowers to XLA's sorted scatter on TPU; invalid/padded events are
routed out of bounds and dropped (``mode='drop'``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .normalize import normalize_to_range


def events_to_voxel_grid(t, x, y, p, count, *, width: int, height: int,
                         num_bins: int = 1) -> jax.Array:
    """Splat a padded event slice into a (num_bins, height, width) float grid.

    Args:
      t, x, y, p: float32 1-D arrays of equal static length N (padded).
        ``t`` in any monotonically increasing unit, ``x``/``y`` in (possibly
        fractional, post-rectification) pixel coordinates, ``p`` in {0, 1}.
      count: scalar int32, number of valid (leading) events.
    """
    n = t.shape[0]
    idx_arange = jnp.arange(n)
    valid = idx_arange < count

    t0 = t[0]
    t_last = t[jnp.maximum(count - 1, 0)]
    denom = t_last - t0
    denom = jnp.where(denom == 0, 1.0, denom)
    t_norm = (num_bins - 1) * (t - t0) / denom

    x0 = x.astype(jnp.int32)  # trunc toward zero, like torch .int()
    y0 = y.astype(jnp.int32)
    t_floor = t_norm.astype(jnp.int32)
    value = 2.0 * p - 1.0

    flat = jnp.zeros((num_bins * height * width,), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dt in (0, 1):
                xl = x0 + dx
                yl = y0 + dy
                tl = t_floor + dt
                in_range = ((xl >= 0) & (xl < width) & (yl >= 0) & (yl < height)
                            & (tl >= 0) & (tl < num_bins) & valid)
                w = (value
                     * (1.0 - jnp.abs(xl.astype(jnp.float32) - x))
                     * (1.0 - jnp.abs(yl.astype(jnp.float32) - y))
                     * (1.0 - jnp.abs(tl.astype(jnp.float32) - t_norm)))
                index = height * width * tl + width * yl + xl
                index = jnp.where(in_range, index, num_bins * height * width)
                flat = flat.at[index].add(jnp.where(in_range, w, 0.0),
                                          mode="drop")
    return flat.reshape(num_bins, height, width)


def events_norm(events: jax.Array, clip_range, final_range: float = 1.0,
                enforce_no_events_zero: bool = True) -> jax.Array:
    """Normalize a voxel grid to [-final_range, final_range].

    Standardizes over nonzero cells (mean/std computed on nonzeros only,
    zeros stay zero), then clips to ±clip_range and renormalizes positive and
    negative parts independently by global min-max.  ``clip_range`` may be a
    traced scalar (the DSEC adaptive clip).
    """
    nonzero = events != 0
    num_nonzero = jnp.sum(nonzero)
    safe_n = jnp.maximum(num_nonzero, 1)
    mean = jnp.sum(events) / safe_n
    var = jnp.sum(events ** 2) / safe_n - mean ** 2
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    standardized = jnp.where(nonzero, (events - mean) / (std + 1e-8), 0.0)
    events = jnp.where(num_nonzero > 0, standardized, events)
    p_clip = jnp.asarray(clip_range, jnp.float32)
    n_clip = -p_clip

    if enforce_no_events_zero:
        pos = jnp.clip(jnp.maximum(events, 0.0), 0.0, p_clip)
        pos = normalize_to_range(pos, 0.0, final_range)
        neg = jnp.clip(jnp.minimum(events, 0.0), n_clip, 0.0)
        neg = normalize_to_range(neg, -final_range, 0.0)
        return pos + neg
    out = jnp.clip(events, n_clip, p_clip) * final_range
    return out / p_clip * final_range
