"""Pallas TPU kernel: fused bilinear-upsample + weighted softmax-CE.

The reference loss path (mmseg/models/decode_heads/decode_head.py:221-239 /
:592-596) bilinearly resizes the stride-4 logits to label resolution and
runs weighted cross-entropy on the result.  Under XLA that materializes the
[B, 512, 512, 19] f32 upsampled logits in HBM (≈160 MB per stream at
batch 8) between the resize dot_generals and the softmax chain — in the
forward pass, and AGAIN in the backward recompute (the loss is wrapped in
``jax.checkpoint`` to keep those tensors off the peak; docs/PERF.md).

This kernel keeps the upsampled logits entirely in VMEM: per (batch, row
tile) grid step it
  1. expands the stride-4 logits along W once per image via an MXU matmul
     with the fixed half-pixel interpolation matrix (cached in VMEM
     scratch),
  2. expands a row tile along H with a second matmul,
  3. immediately computes max/exp/sum softmax-CE, the label select (one-hot
     compare + reduce — never a gather), the validity/weight masking and
     the argmax-accuracy count, and
  4. accumulates scalar partials into an SMEM output.
The custom VJP runs the mirror kernel: recompute the row tile, form
(softmax - onehot) * weight * cotangent, and contract back through the two
interpolation matrices — the full-resolution tensor never touches HBM in
either direction.

Interpolation matches ``ops.resize.resize_bilinear`` (align_corners=False
half-pixel, edge clamp == jax.image.resize(method='linear',
antialias=False) for upsampling) to float roundoff; CE semantics match
``ops.losses.weighted_cross_entropy`` (zero loss at ignore_index, mean over
ALL pixels); accuracy matches ``ops.losses.pixel_accuracy``.  Parity-tested
in tests/test_pallas.py (interpret mode on CPU, values + gradients).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Opt-in perf lever (docs/PERF.md round-4 table): route multi_stream_loss's
# resize+CE through the fused kernel.  Read at trace time; toggling clears
# the jit caches so late flips retrace (same pattern as
# ops.resize.set_fused_int_upsample).  Production gate additionally
# requires a TPU backend; tests force the interpret path on CPU.
_FUSED_CE = False
_FUSED_CE_INTERPRET = False


def set_fused_upsample_ce(enabled: bool, *, interpret: bool = False) -> None:
    """Toggle the fused Pallas upsample+CE path globally.

    ``interpret=True`` (tests only) routes even off-TPU, running the kernel
    in the Pallas interpreter."""
    global _FUSED_CE, _FUSED_CE_INTERPRET
    enabled, interpret = bool(enabled), bool(interpret)
    if (enabled, interpret) != (_FUSED_CE, _FUSED_CE_INTERPRET):
        _FUSED_CE, _FUSED_CE_INTERPRET = enabled, interpret
        jax.clear_caches()


def fused_ce_mode():
    """None when the fused path is off / unsupported on this backend;
    otherwise {"interpret": bool} for fused_upsample_ce."""
    if not _FUSED_CE:
        return None
    if _FUSED_CE_INTERPRET:
        return {"interpret": True}
    if jax.default_backend() != "tpu":
        return None
    return {"interpret": False}


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] half-pixel linear interpolation weights (edge-clamped),
    the matrix form of ops.resize._phase_upsample_axis's two-tap blend."""
    y = np.arange(n_out, dtype=np.float64)
    src = (y + 0.5) * (n_in / n_out) - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    m = np.zeros((n_out, n_in), np.float64)
    lo = np.clip(i0, 0, n_in - 1)
    hi = np.clip(i0 + 1, 0, n_in - 1)
    np.add.at(m, (y.astype(np.int64), lo), 1.0 - t)
    np.add.at(m, (y.astype(np.int64), hi), t)
    return m.astype(np.float32)


def _row_tile(H: int) -> int:
    for ht in (32, 16, 8, 4, 2, 1):
        if H % ht == 0:
            return ht
    return 1


def _fwd_kernel(z_ref, aw_ref, ah_ref, lbl_ref, wgt_ref, out_ref, zw_ref,
                *, ignore_index: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z = z_ref[:].astype(jnp.float32)                       # [h, C, w]
        zw_ref[:] = jax.lax.dot_general(                       # [h, C, W]
            z, aw_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    zt = jax.lax.dot_general(                                  # [Ht, C, W]
        ah_ref[:], zw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    lbl = lbl_ref[:]                                           # [Ht, W]
    valid = lbl != ignore_index
    m = jnp.max(zt, axis=1)
    lse = jnp.log(jnp.sum(jnp.exp(zt - m[:, None, :]), axis=1)) + m
    cls = jax.lax.broadcasted_iota(jnp.int32, zt.shape, 1)
    onehot = (cls == jnp.where(valid, lbl, 0)[:, None, :]
              ).astype(jnp.float32)
    sel = jnp.sum(zt * onehot, axis=1)
    nll = jnp.where(valid, lse - sel, 0.0) * wgt_ref[:]
    correct = jnp.sum(jnp.where(
        (jnp.argmax(zt, axis=1) == lbl) & valid, 1.0, 0.0))

    @pl.when(t == 0)
    def _():
        out_ref[0] = 0.0
        out_ref[1] = 0.0

    out_ref[0] += jnp.sum(nll)
    out_ref[1] += correct


def _bwd_kernel(g_ref, z_ref, aw_ref, ah_ref, lbl_ref, wgt_ref, dz_ref,
                zw_ref, p_ref, *, ignore_index: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z = z_ref[:].astype(jnp.float32)
        zw_ref[:] = jax.lax.dot_general(
            z, aw_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p_ref[:] = jnp.zeros_like(p_ref)

    zt = jax.lax.dot_general(
        ah_ref[:], zw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [Ht, C, W]
    lbl = lbl_ref[:]
    valid = lbl != ignore_index
    m = jnp.max(zt, axis=1, keepdims=True)
    e = jnp.exp(zt - m)
    softmax = e / jnp.sum(e, axis=1, keepdims=True)
    cls = jax.lax.broadcasted_iota(jnp.int32, zt.shape, 1)
    onehot = (cls == jnp.where(valid, lbl, 0)[:, None, :]
              ).astype(jnp.float32)
    coef = (jnp.where(valid, wgt_ref[:], 0.0) * g_ref[0, 0])[:, None, :]
    dzt = (softmax - onehot) * coef
    p_ref[:] += jax.lax.dot_general(                           # [h, C, W]
        ah_ref[:], dzt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        dz = jax.lax.dot_general(                              # [h, C, w]
            p_ref[:], aw_ref[:], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz_ref[:] = dz.astype(dz_ref.dtype)


def _cost(b, h, w, c, H, W, transcendentals: bool):
    flops = 2 * b * (h * c * w * W + H * h * c * W)
    return pl.CostEstimate(
        flops=flops, bytes_accessed=b * (h * w * c * 4 + 2 * H * W * 4),
        transcendentals=b * H * W * c if transcendentals else 0)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ce_sums(z2, label, weight, ignore_index, interpret):
    out, _ = _ce_sums_fwd(z2, label, weight, ignore_index, interpret)
    return out


def _ce_sums_fwd(z2, label, weight, ignore_index, interpret):
    b, h, c, w = z2.shape
    H, W = label.shape[1:3]
    ht = _row_tile(H)
    aw = jnp.asarray(_interp_matrix(w, W).T)                   # [w, W]
    ah = jnp.asarray(_interp_matrix(h, H))                     # [H, h]
    out = pl.pallas_call(
        partial(_fwd_kernel, ignore_index=ignore_index),
        grid=(b, H // ht),
        in_specs=[
            pl.BlockSpec((None, h, c, w), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, W), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ht, h), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ht, W), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ht, W), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 2), lambda i, t: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, c, W), jnp.float32)],
        cost_estimate=_cost(b, h, w, c, H, W, True),
        interpret=interpret,
    )(z2, aw, ah, label, weight)
    sums = jnp.sum(out, axis=0)
    return (sums[0], sums[1]), (z2, label, weight)


def _ce_sums_bwd(ignore_index, interpret, res, g):
    z2, label, weight = res
    g_sum = jnp.asarray(g[0], jnp.float32).reshape(1, 1)
    b, h, c, w = z2.shape
    H, W = label.shape[1:3]
    ht = _row_tile(H)
    aw = jnp.asarray(_interp_matrix(w, W).T)
    ah = jnp.asarray(_interp_matrix(h, H))
    dz2 = pl.pallas_call(
        partial(_bwd_kernel, ignore_index=ignore_index),
        grid=(b, H // ht),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, h, c, w), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, W), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ht, h), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ht, W), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ht, W), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, h, c, w), lambda i, t: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(z2.shape, z2.dtype),
        scratch_shapes=[pltpu.VMEM((h, c, W), jnp.float32),
                        pltpu.VMEM((h, c, W), jnp.float32)],
        cost_estimate=_cost(b, h, w, c, H, W, True),
        interpret=interpret,
    )(g_sum, z2, aw, ah, label, weight)
    return dz2, None, None


_ce_sums.defvjp(_ce_sums_fwd, _ce_sums_bwd)


def fused_upsample_ce(logits: jax.Array, label: jax.Array,
                      weight: jax.Array | None = None, *,
                      ignore_index: int = 255,
                      interpret: bool = False):
    """Mean weighted CE of logits bilinearly upsampled to ``label``'s
    resolution, plus top-1 pixel accuracy (%) of the upsampled logits.

    Drop-in fusion of ``weighted_cross_entropy(resize_bilinear(logits,
    label.shape[1:3]), label, weight)`` and ``pixel_accuracy`` — without
    ever materializing the upsampled logits in HBM.  ``weight`` receives no
    gradient (it never does in practice: pseudo-label weights come from the
    stop-gradded teacher) — enforced with an explicit stop_gradient.

    Returns ``(loss, acc)``.
    """
    b, h, w, c = logits.shape
    H, W = label.shape[1:3]
    z2 = jnp.transpose(logits, (0, 1, 3, 2))                   # [B, h, C, w]
    label = label.astype(jnp.int32)
    if weight is None:
        weight = jnp.ones((b, H, W), jnp.float32)
    else:
        weight = jax.lax.stop_gradient(
            jnp.broadcast_to(weight, (b, H, W)).astype(jnp.float32))
    nll_sum, correct = _ce_sums(z2, label, weight, int(ignore_index),
                                bool(interpret))
    n = b * H * W
    return nll_sum / n, 100.0 * correct / n
