"""Golden tests for the ISR (Image Motion-Extractor) ops.

The oracle re-implements the published ISR formulas in torch/numpy inside
this test (log remap -> diff -> dead zone -> clip -> per-sign global min-max
renorm; reference mmseg/datasets/utils.py:87-152) and checks the jnp
implementation against it.
"""
import numpy as np
import pytest
import torch
from PIL import Image

import jax.numpy as jnp

from cmda_tpu.ops.isr import (
    get_ic, image_change_from_gray, image_to_isr, pil_grayscale,
)


def torch_normalize_to_range(t, min_val, max_val):
    tmin, tmax = torch.min(t), torch.max(t)
    return (t - tmin) / (tmax - tmin + 1e-8) * (max_val - min_val) + min_val


def torch_get_ic(front, now, val_range, threshold, clip_range):
    lo, hi = val_range
    a = torch.log(torch.as_tensor(front, dtype=torch.float32) / 255 * (hi - lo) + lo)
    b = torch.log(torch.as_tensor(now, dtype=torch.float32) / 255 * (hi - lo) + lo)
    d = b - a
    thr = (np.log(hi) - np.log(lo)) * threshold
    clip = (np.log(hi) - np.log(lo)) * clip_range
    d[d.abs() <= thr] = 0
    neg = d.clone()
    d[d < 0] = 0
    pos = torch_normalize_to_range(torch.clamp(d, 0, clip), 0.0, 1.0)
    neg[neg > 0] = 0
    neg = torch_normalize_to_range(torch.clamp(neg, -clip, 0), -1.0, 0.0)
    return pos + neg


def shift_gray(gray, shift, direction, width, height):
    """Oracle shift with border replication via concatenation."""
    if direction == "right":
        return np.concatenate([gray[:, :shift], gray[:, : width - shift]], axis=1)
    if direction == "left":
        return np.concatenate([gray[:, shift:], gray[:, width - shift:]], axis=1)
    if direction == "down":
        return np.concatenate([gray[:shift, :], gray[: height - shift, :]], axis=0)
    assert direction == "up"
    return np.concatenate([gray[shift:, :], gray[height - shift:, :]], axis=0)


ISR_PARMS = dict(val_range=(0.01, 1.01), threshold=0.005, clip_range=0.1)


@pytest.fixture
def gray():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(64, 80)).astype(np.float32)


def test_get_ic_matches_oracle(gray):
    now = shift_gray(gray, 1, "right", 80, 64)
    ours = np.asarray(get_ic(jnp.asarray(gray), jnp.asarray(now), **ISR_PARMS))
    theirs = torch_get_ic(gray, now, (0.01, 1.01), 0.005, 0.1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


@pytest.mark.parametrize("direction", ["rightdown", "leftup", "leftdown", "rightup"])
def test_image_change_directions(gray, direction):
    h, w = gray.shape
    row_dir = "left" if "left" in direction else "right"
    col_dir = "up" if "up" in direction else "down"
    oracle = (torch_get_ic(gray, shift_gray(gray, 2, row_dir, w, h), (0.01, 1.01), 0.005, 0.1) / 2
              + torch_get_ic(gray, shift_gray(gray, 2, col_dir, w, h), (0.01, 1.01), 0.005, 0.1) / 2)
    ours = np.asarray(image_change_from_gray(
        jnp.asarray(gray), shift_pixel=2, shift_direction=direction, **ISR_PARMS))
    np.testing.assert_allclose(ours, oracle.numpy(), atol=2e-3)


def test_image_change_direction_idx_matches_static(gray):
    from cmda_tpu.ops.isr import SHIFT_DIRECTIONS
    for idx, name in enumerate(SHIFT_DIRECTIONS):
        a = np.asarray(image_change_from_gray(
            jnp.asarray(gray), shift_pixel=1, shift_direction=name, **ISR_PARMS))
        b = np.asarray(image_change_from_gray(
            jnp.asarray(gray), shift_pixel=1, shift_direction=None,
            direction_idx=jnp.asarray(idx), **ISR_PARMS))
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_image_change_all_directions(gray):
    h, w = gray.shape
    oracle = sum(
        torch_get_ic(gray, shift_gray(gray, 3, d, w, h), (0.01, 1.01), 0.005, 0.1) / 4
        for d in ["up", "left", "down", "right"])
    ours = np.asarray(image_change_from_gray(
        jnp.asarray(gray), shift_pixel=3, shift_direction="all", **ISR_PARMS))
    np.testing.assert_allclose(ours, oracle.numpy(), atol=2e-3)


def test_pil_grayscale_bit_exact():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(32, 48, 3)).astype(np.uint8)
    pil_gray = np.array(Image.fromarray(rgb).convert("L"))
    ours = np.asarray(pil_grayscale(jnp.asarray(rgb)))
    np.testing.assert_array_equal(ours, pil_gray)


def test_image_to_isr_matches_pil_round_trip():
    """End-to-end: [0,1] RGB -> uint8 -> PIL gray -> ISR chain."""
    rng = np.random.default_rng(2)
    img01 = rng.random(size=(64, 64, 3)).astype(np.float32)
    # oracle: the reference's exact host chain
    u8 = np.uint8(np.clip(img01 * 255, 0, 255))
    gray = np.array(Image.fromarray(u8).convert("L")).astype(np.float32)
    oracle = (torch_get_ic(gray, shift_gray(gray, 3, "right", 64, 64), (1, 100), 0.04, 0.2) / 2
              + torch_get_ic(gray, shift_gray(gray, 3, "down", 64, 64), (1, 100), 0.04, 0.2) / 2)
    ours = np.asarray(image_to_isr(
        jnp.asarray(img01), val_range=(1, 100), threshold=0.04, clip_range=0.2,
        shift_pixel=3, shift_direction="rightdown"))
    np.testing.assert_allclose(ours, oracle.numpy(), atol=2e-3)
