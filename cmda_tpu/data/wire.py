"""Compact host->device wire format for training batches.

The axon-tunnel profile of the integrated b5 circuit showed the step gap
dominated not by sample decode but by h2d bytes: a flagship batch ships
~158 MB of float32 per step, and both the tunnel proxy and the client's
serialization burn the sandbox's single core moving it. Three lossless-or-
bf16 reductions cut the wire ~3.6x:

  * mono streams (ISR / events / image-change) are produced as stride-0
    broadcast views over one channel (the datasets tile 1->3 for the conv
    stems; reference dsec.py:368-372, cityscapes_ic.py:239-241) — ship ONE
    channel and re-broadcast on device, where it is free;
  * float32 leaves travel as bfloat16 (the model computes in bf16 anyway;
    quantizing the already-normalized inputs adds noise below the compute
    dtype's own rounding);
  * labels are trainIds 0-18 + 255 ignore — exactly uint8.

``encode_wire`` runs on host (numpy); ``decode_wire`` runs as the first
ops INSIDE the jitted train step, where the dtype/shape dispatch happens
at trace time: an un-encoded float32 batch traces to the identical HLO as
before (no convert/broadcast ops are inserted), so CPU tests and the
persistent-cache keys of synthetic-batch benches are unaffected.
"""
from __future__ import annotations

import numpy as np

# streams the datasets tile mono -> 3 channels for the conv stems
WIRE_MONO_KEYS = frozenset({"img_self_res", "img_time_res", "isr", "events"})


def _f32_to_bf16(arr):
    """float32 -> bfloat16 (round-to-nearest-even; ml_dtypes' C cast,
    ~12 GB/s here — measured same speed as a raw uint-shift view)."""
    import ml_dtypes
    return arr.astype(ml_dtypes.bfloat16)


def encode_wire(batch):
    """numpy batch dict (possibly nested) -> compact wire dict."""

    def enc(key, arr):
        if isinstance(arr, dict):
            return {k: enc(k, v) for k, v in arr.items()}
        arr = np.asarray(arr)
        if key == "label" and arr.dtype == np.int32:
            return arr.astype(np.uint8)
        if arr.dtype == np.float32:
            if (key in WIRE_MONO_KEYS and arr.ndim >= 2
                    and arr.strides[-1] == 0):
                arr = arr[..., :1]
            return _f32_to_bf16(arr)
        return arr

    return {k: enc(k, v) for k, v in batch.items()}


def decode_wire(batch):
    """Inverse of encode_wire, in jnp, for use INSIDE a jitted step.

    All dispatch is on static dtype/shape, so for a batch that was never
    encoded this is the identity at trace time."""
    import jax.numpy as jnp

    def dec(key, x):
        if isinstance(x, dict):
            return {k: dec(k, v) for k, v in x.items()}
        if key == "label" and x.dtype != jnp.int32:
            return x.astype(jnp.int32)
        if x.dtype == jnp.bfloat16:
            x = x.astype(jnp.float32)
        if (key in WIRE_MONO_KEYS and hasattr(x, "ndim") and x.ndim == 4
                and x.shape[-1] == 1):
            x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
        return x

    return {k: dec(k, v) for k, v in batch.items()}
