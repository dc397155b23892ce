"""Pallas ISR kernel vs the jnp reference implementation (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cmda_tpu.ops.isr import image_change_from_gray
from cmda_tpu.ops.pallas_kernels import pallas_batched_isr

PARAMS = dict(val_range=(0.01, 1.01), threshold=0.005, clip_range=0.1)


def test_pallas_isr_matches_jnp_interpret():
    g = np.random.default_rng(0)
    gray = (g.random((3, 64, 128)) * 255).astype(np.float32)
    dirs = jnp.asarray([0, 2, 3], jnp.int32)
    out = pallas_batched_isr(jnp.asarray(gray), dirs, shift_pixel=2,
                             interpret=True, **PARAMS)
    for i, d in enumerate([0, 2, 3]):
        ref = image_change_from_gray(
            jnp.asarray(gray[i]), shift_pixel=2, shift_direction=None,
            direction_idx=jnp.asarray(d), **PARAMS)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   atol=1e-5)
