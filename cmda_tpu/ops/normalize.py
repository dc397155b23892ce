"""Normalization constants and range-normalization helpers.

Mirrors behavior of the reference's ``tensor_normalize_to_range``
(reference mmseg/datasets/utils.py:10-14) and the ImageNet img_norm_cfg used
throughout (reference mmseg/models/utils/dacs_transforms.py:38-49).
"""
from __future__ import annotations

import jax.numpy as jnp

# img_norm_cfg mean/std applied to 0-255 RGB images.
IMAGENET_MEAN = jnp.asarray([123.675, 116.28, 103.53], dtype=jnp.float32)
IMAGENET_STD = jnp.asarray([58.395, 57.12, 57.375], dtype=jnp.float32)


def normalize_to_range(x, min_val: float, max_val: float):
    """Global min-max rescale of the whole tensor to [min_val, max_val].

    ``(x - min) / (max - min + 1e-8) * (max_val - min_val) + min_val``
    """
    x_min = jnp.min(x)
    x_max = jnp.max(x)
    return (x - x_min) / (x_max - x_min + 1e-8) * (max_val - min_val) + min_val


def denorm_image(img, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Normalized NHWC image -> [0, 1] RGB."""
    return (img * std + mean) / 255.0


def renorm_image(img01, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """[0, 1] RGB NHWC image -> normalized."""
    return (img01 * 255.0 - mean) / std
