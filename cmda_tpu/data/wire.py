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


def encode_wire(batch, pack: bool = True):
    """numpy batch dict (possibly nested) -> compact wire dict.

    With ``pack`` (default), all same-[B,H,W]-geometry bf16 streams are
    additionally CONCATENATED into one ``packed::<spec>`` tensor so a step
    ships TWO h2d transfers (packed floats + labels) instead of eight —
    each transfer pays the tunnel's per-call latency, which at ~80 ms RTT
    dominates the actual bytes. The spec (dotted path:channels, in order)
    rides in the dict KEY, which is static under jit, so decode_wire can
    split without any side-channel."""

    def enc(key, arr):
        arr = np.asarray(arr)
        if key == "label" and arr.dtype == np.int32:
            return arr.astype(np.uint8)
        if arr.dtype == np.float32:
            if (key in WIRE_MONO_KEYS and arr.ndim >= 2
                    and arr.strides[-1] == 0):
                arr = arr[..., :1]
            return _f32_to_bf16(arr)
        return arr

    out = {}
    packable = []   # (dotted path, encoded [B,H,W,C] bf16 array)
    geom = None

    def walk(prefix, d, dst):
        nonlocal geom
        for k, v in d.items():
            if isinstance(v, dict):
                sub = dst.setdefault(k, {})
                walk(prefix + k + ".", v, sub)
                continue
            e = enc(k, v)
            if (pack and str(e.dtype) == "bfloat16" and e.ndim == 4
                    and (geom is None or e.shape[:3] == geom)):
                geom = e.shape[:3]
                packable.append((prefix + k, e))
            else:
                dst[k] = e

    walk("", batch, out)
    if len(packable) > 1:
        spec = ",".join(f"{p}:{a.shape[-1]}" for p, a in packable)
        out["packed::" + spec] = np.concatenate([a for _, a in packable],
                                                axis=-1)
    else:
        for p, a in packable:
            parts = p.split(".")
            d = out
            for q in parts[:-1]:
                d = d.setdefault(q, {})
            d[parts[-1]] = a
    return {k: v for k, v in out.items() if not isinstance(v, dict) or v}


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

    out = {}
    packed_items = []
    for k, v in batch.items():
        if isinstance(k, str) and k.startswith("packed::"):
            packed_items.append((k, v))
        else:
            out[k] = dec(k, v)
    for k, v in packed_items:
        off = 0
        for entry in k[len("packed::"):].split(","):
            path, ch = entry.rsplit(":", 1)
            ch = int(ch)
            parts = path.split(".")
            d = out
            for q in parts[:-1]:
                d = d.setdefault(q, {})
            d[parts[-1]] = dec(parts[-1], v[..., off:off + ch])
            off += ch
    return out
