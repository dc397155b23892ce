"""Golden tests for the event voxel grid + normalization.

Oracle: torch put_(accumulate=True) trilinear splat and the nonzero
standardize -> clip -> per-sign renorm chain (formulas from
reference mmseg/datasets/dsec.py:26-121), re-implemented here.
"""
import numpy as np
import torch

import jax.numpy as jnp

from cmda_tpu.ops.voxel import events_to_voxel_grid, events_norm


def torch_voxel_grid(time, x, y, pol, width, height, num_bins):
    time = torch.as_tensor(time)
    x = torch.as_tensor(x)
    y = torch.as_tensor(y)
    pol = torch.as_tensor(pol)
    grid = torch.zeros((num_bins, height, width), dtype=torch.float32)
    C, H, W = grid.shape
    t_norm = (C - 1) * (time - time[0]) / (time[-1] - time[0]) if len(time) > 1 and time[-1] != time[0] \
        else torch.zeros_like(time)
    x0, y0, t0 = x.int(), y.int(), t_norm.int()
    value = 2 * pol - 1
    for xlim in [x0, x0 + 1]:
        for ylim in [y0, y0 + 1]:
            for tlim in [t0, t0 + 1]:
                mask = ((xlim < W) & (xlim >= 0) & (ylim < H) & (ylim >= 0)
                        & (tlim >= 0) & (tlim < num_bins))
                w = value * (1 - (xlim - x).abs()) * (1 - (ylim - y).abs()) \
                    * (1 - (tlim - t_norm).abs())
                index = H * W * tlim.long() + W * ylim.long() + xlim.long()
                grid.put_(index[mask], w[mask], accumulate=True)
    return grid.numpy()


def torch_events_norm(events, clip_range, final_range=1.0):
    events = torch.as_tensor(events).clone()
    nonzero = events != 0
    n = nonzero.sum()
    if n > 0:
        mean = events.sum() / n
        std = torch.sqrt((events ** 2).sum() / n - mean ** 2)
        events = nonzero.float() * (events - mean) / (std + 1e-8)
    def norm_range(t, lo, hi):
        tmin, tmax = t.min(), t.max()
        return (t - tmin) / (tmax - tmin + 1e-8) * (hi - lo) + lo
    neg = events.clone()
    events = torch.clamp(torch.clamp(events, min=0), 0, clip_range)
    events = norm_range(events, 0, final_range)
    neg[neg > 0] = 0
    neg = torch.clamp(neg, -clip_range, 0)
    neg = norm_range(neg, -final_range, 0)
    return (events + neg).numpy()


def make_events(n, width=64, height=48, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.random(n)).astype(np.float32) * 1e5
    x = (rng.random(n) * (width - 1)).astype(np.float32)
    y = (rng.random(n) * (height - 1)).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    return t, x, y, p


def test_voxel_grid_matches_torch_bins1():
    t, x, y, p = make_events(500)
    oracle = torch_voxel_grid(t, x, y, p, 64, 48, 1)
    ours = np.asarray(events_to_voxel_grid(
        jnp.asarray(t), jnp.asarray(x), jnp.asarray(y), jnp.asarray(p),
        jnp.asarray(500), width=64, height=48, num_bins=1))
    np.testing.assert_allclose(ours, oracle, atol=1e-3)


def test_voxel_grid_matches_torch_bins5():
    t, x, y, p = make_events(800, seed=3)
    oracle = torch_voxel_grid(t, x, y, p, 64, 48, 5)
    ours = np.asarray(events_to_voxel_grid(
        jnp.asarray(t), jnp.asarray(x), jnp.asarray(y), jnp.asarray(p),
        jnp.asarray(800), width=64, height=48, num_bins=5))
    np.testing.assert_allclose(ours, oracle, atol=1e-3)


def test_voxel_grid_padding_ignored():
    t, x, y, p = make_events(300, seed=4)
    # pad with garbage beyond count
    pad = 100
    tp = np.concatenate([t, np.full(pad, 1e9, np.float32)])
    xp = np.concatenate([x, np.full(pad, -5.0, np.float32)])
    yp = np.concatenate([y, np.full(pad, 1e4, np.float32)])
    pp = np.concatenate([p, np.ones(pad, np.float32)])
    full = np.asarray(events_to_voxel_grid(
        jnp.asarray(t), jnp.asarray(x), jnp.asarray(y), jnp.asarray(p),
        jnp.asarray(300), width=64, height=48, num_bins=2))
    padded = np.asarray(events_to_voxel_grid(
        jnp.asarray(tp), jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(pp),
        jnp.asarray(300), width=64, height=48, num_bins=2))
    np.testing.assert_allclose(padded, full, atol=1e-5)


def test_events_norm_matches_torch():
    rng = np.random.default_rng(5)
    grid = rng.normal(size=(1, 48, 64)).astype(np.float32)
    grid[np.abs(grid) < 0.7] = 0.0  # sparse, like a real voxel grid
    clip = (np.count_nonzero(grid) / 500000) * 1.5  # adaptive rule
    clip = max(clip, 0.05)
    oracle = torch_events_norm(grid, clip)
    ours = np.asarray(events_norm(jnp.asarray(grid), clip))
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_events_norm_all_zero_passthrough():
    grid = jnp.zeros((1, 8, 8))
    out = np.asarray(events_norm(grid, 1.0))
    assert np.all(np.abs(out) <= 1.0)
