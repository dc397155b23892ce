"""Misc utilities mirroring the reference's utils/utils.py.

  * ``rho_edges``  — the fixed 4-kernel 2x2 edge operator (Rho,
    utils/utils.py:75-94): reflect-pad 1, four rotations of
    [[3,-1],[-1,-1]], output cropped to the input size.
  * ``diff_edges`` — the single-kernel variant (Diff, :97-110).
  * ``zipdir``     — recursive source zip with excluded dirs (:113-128).
"""
from __future__ import annotations

import os
import zipfile

import jax.numpy as jnp
from jax import lax

_RHO_KERNELS = [
    [[3, -1], [-1, -1]],
    [[-1, 3], [-1, -1]],
    [[-1, -1], [-1, 3]],
    [[-1, -1], [3, -1]],
]


def _edge_conv(x, kernels):
    """x [B,H,W,1] -> [B,H,W,len(kernels)] fixed 2x2 reflect-pad conv."""
    k = jnp.asarray(kernels, jnp.float32)          # [N,2,2]
    w = jnp.transpose(k, (1, 2, 0))[:, :, None, :]  # HWIO [2,2,1,N]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = lax.conv_general_dilated(
        xp.astype(jnp.float32), w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # torch Conv2d(k=2, pad=1) yields H+1; the reference crops [:-1,:-1]
    return y[:, :-1, :-1, :]


def rho_edges(x):
    """4-direction fixed edge responses [B,H,W,4] of a [B,H,W,1] image."""
    return _edge_conv(x, _RHO_KERNELS)


def diff_edges(x):
    """Single-direction fixed edge response [B,H,W,1]."""
    return _edge_conv(x, _RHO_KERNELS[:1])


def zipdir(path: str, zip_file_path: str,
           not_included_dirs=("dsec_dataset", "work_dirs",
                              "pretrained_model", "wandb", ".git")):
    """Zip a source tree, skipping data/artifact dirs and .zip files."""
    with zipfile.ZipFile(zip_file_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(path):
            if any(ex in root for ex in not_included_dirs):
                continue
            for f in files:
                if f.endswith(".zip"):
                    continue
                zf.write(os.path.join(root, f))
    return zip_file_path
