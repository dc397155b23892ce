"""Pallas TPU kernel: fused integer-factor bilinear upsample + softmax CE.

The reference loss path (reference mmseg/models/decode_heads/decode_head.py:
221-239 + mmseg/models/losses/cross_entropy_loss.py:11-34) bilinearly
upsamples the stride-4 logits to label resolution and takes the mean
weighted per-pixel cross-entropy.  As XLA ops this materializes the
[B, H, W, C] f32 resized logits in HBM several times per step (resize out,
softmax, select, reduce — the ~7% CE/loss trace bucket, docs/PERF.md).

``fused_resize_ce`` computes the SAME scalar without the fine logits ever
touching HBM, in either direction:

* The x``f`` half-pixel bilinear upsample decomposes by PHASE: output pixel
  ``o = f*i + p`` is a fixed two-tap blend of coarse pixels ``i-1/i/i+1``
  with weights depending only on ``p`` (the same weights as
  ``ops.resize.phase_upsample_bilinear``, parity-tested there against
  ``jax.image.resize``).  The kernel walks the ``f_h`` row phases on the
  grid and the ``f_w`` column phases in-register, reducing each phase
  sub-image's weighted NLL on the fly.
* Layout: the class axis is moved OFF the lane dimension ([B, C, h, w];
  19 classes on lanes would pad 19->128).  Per-class [h, w] planes tile
  the VPU exactly; class loops are ``fori_loop``s over the leading dim.
* Labels/weights are re-tiled once, outside the kernel, into phase-major
  [B, f_h, f_w, h, w] so the kernel never does strided lane access.
* Backward is a second kernel (custom_vjp): recomputes the phase logits
  in VMEM, forms ``(softmax - onehot) * coeff`` and applies the TRANSPOSE
  of the two-tap blends (shift-adds with edge accumulation).  The grad of
  the pixel-weight map is a third, separate kernel so XLA dead-code
  eliminates it when (as in DACS — pseudo-weights are stop-gradient) the
  weight cotangent is unused.

Numerics match ``weighted_cross_entropy(resize_bilinear(x, size), ...)``
to float32 roundoff in values AND gradients (tests/test_pallas.py).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase_weights(p, f):
    """Two-tap blend weights (w_prev, w_self, w_next) for phase ``p`` of an
    integer-factor-``f`` half-pixel upsample.  ``p`` may be a traced scalar
    (row phases ride the grid) or a Python int (column phases unroll)."""
    if isinstance(p, int):
        d = (p + 0.5) / f - 0.5
        return max(-d, 0.0), 1.0 - abs(d), max(d, 0.0)
    d = (p.astype(jnp.float32) + 0.5) / f - 0.5
    wp = jnp.maximum(-d, 0.0)
    wn = jnp.maximum(d, 0.0)
    return wp, 1.0 - wp - wn, wn


def _row_prev(x):
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def _row_next(x):
    return jnp.concatenate([x[1:], x[-1:]], axis=0)


def _col_prev(x):
    return jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)


def _col_next(x):
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def _shift_t_prev(dy, axis):
    """Transpose of the clamped prev-shift y[j] = x[max(j-1, 0)]."""
    n = dy.shape[axis]
    sl = lambda a, b: jax.lax.slice_in_dim(dy, a, b, axis=axis)
    head = sl(0, 1) + sl(1, 2)
    tail = jnp.zeros_like(sl(0, 1))
    return jnp.concatenate([head, sl(2, n), tail], axis=axis)


def _shift_t_next(dy, axis):
    """Transpose of the clamped next-shift y[j] = x[min(j+1, n-1)]."""
    n = dy.shape[axis]
    sl = lambda a, b: jax.lax.slice_in_dim(dy, a, b, axis=axis)
    head = jnp.zeros_like(sl(0, 1))
    tail = sl(n - 2, n - 1) + sl(n - 1, n)
    return jnp.concatenate([head, sl(0, n - 2), tail], axis=axis)


def _fill_phase_logits(x_ref, z_ref, wr, wq, num_classes, h, w):
    """z_ref[c] <- phase (p, q) sub-image of upsample(x) per class; returns
    the running class max.  wr = traced row weights, wq = static col."""
    wpr, wsr, wnr = wr
    wpq, wsq, wnq = wq

    def fill(c, m):
        xc = x_ref[0, c]
        r = wsr * xc + wpr * _row_prev(xc) + wnr * _row_next(xc)
        z = wsq * r
        if wpq:
            z = z + wpq * _col_prev(r)
        if wnq:
            z = z + wnq * _col_next(r)
        z_ref[c] = z
        return jnp.maximum(m, z)

    return jax.lax.fori_loop(
        0, num_classes, fill, jnp.full((h, w), -jnp.inf, jnp.float32))


def _ce_fwd_kernel(x_ref, lbl_ref, wgt_ref, out_ref, z_ref, *,
                   fh, fw, num_classes, ignore_index, has_weight):
    p = pl.program_id(1)
    wr = _phase_weights(p, fh)
    h, w = x_ref.shape[2], x_ref.shape[3]
    total = jnp.zeros((), jnp.float32)
    for q in range(fw):
        m = _fill_phase_logits(x_ref, z_ref, wr, _phase_weights(q, fw),
                               num_classes, h, w)
        lbl = lbl_ref[0, 0, q]

        def reduce_body(c, carry):
            s, zsel = carry
            z = z_ref[c]
            return (s + jnp.exp(z - m),
                    zsel + jnp.where(lbl == c, z, 0.0))

        s, zsel = jax.lax.fori_loop(
            0, num_classes, reduce_body,
            (jnp.zeros((h, w), jnp.float32), jnp.zeros((h, w), jnp.float32)))
        nll = jnp.where(lbl != ignore_index, m + jnp.log(s) - zsel, 0.0)
        if has_weight:
            nll = nll * wgt_ref[0, 0, q]
        total = total + jnp.sum(nll)
    out_ref[0, 0, 0, 0] = total


def _ce_bwd_kernel(g_ref, x_ref, lbl_ref, wgt_ref, dx_ref, z_ref, dr_ref, *,
                   fh, fw, num_classes, ignore_index, has_weight):
    p = pl.program_id(1)
    wpr, wsr, wnr = _phase_weights(p, fh)
    h, w = x_ref.shape[2], x_ref.shape[3]
    gs = g_ref[0, 0]

    @pl.when(p == 0)
    def _():
        dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    for q in range(fw):
        wq = _phase_weights(q, fw)
        wpq, wsq, wnq = wq
        m = _fill_phase_logits(x_ref, z_ref, (wpr, wsr, wnr), wq,
                               num_classes, h, w)

        def sum_body(c, s):
            return s + jnp.exp(z_ref[c] - m)

        s = jax.lax.fori_loop(0, num_classes, sum_body,
                              jnp.zeros((h, w), jnp.float32))
        lse = m + jnp.log(s)
        lbl = lbl_ref[0, 0, q]
        coef = jnp.where(lbl != ignore_index, gs, 0.0)
        if has_weight:
            coef = coef * wgt_ref[0, 0, q]

        def grad_body(c, _):
            z = z_ref[c]
            dz = (jnp.exp(z - lse)
                  - (lbl == c).astype(jnp.float32)) * coef
            contrib = wsq * dz
            if wpq:
                contrib = contrib + wpq * _shift_t_prev(dz, 1)
            if wnq:
                contrib = contrib + wnq * _shift_t_next(dz, 1)
            if q == 0:
                dr_ref[c] = contrib
            else:
                dr_ref[c] = dr_ref[c] + contrib
            return 0

        jax.lax.fori_loop(0, num_classes, grad_body, 0)

    def row_t_body(c, _):
        dr = dr_ref[c]
        out = (wsr * dr + wpr * _shift_t_prev(dr, 0)
               + wnr * _shift_t_next(dr, 0))
        dx_ref[0, c] = dx_ref[0, c] + out
        return 0

    jax.lax.fori_loop(0, num_classes, row_t_body, 0)


def _ce_dw_kernel(g_ref, x_ref, lbl_ref, dw_ref, z_ref, *,
                  fh, fw, num_classes, ignore_index):
    """d(loss)/d(weight map) = per-pixel unweighted NLL * g / N,
    phase-major output (separate call: DCE'd when the cotangent is unused)."""
    p = pl.program_id(1)
    wr = _phase_weights(p, fh)
    h, w = x_ref.shape[2], x_ref.shape[3]
    gs = g_ref[0, 0]
    for q in range(fw):
        m = _fill_phase_logits(x_ref, z_ref, wr, _phase_weights(q, fw),
                               num_classes, h, w)
        lbl = lbl_ref[0, 0, q]

        def reduce_body(c, carry):
            s, zsel = carry
            z = z_ref[c]
            return (s + jnp.exp(z - m),
                    zsel + jnp.where(lbl == c, z, 0.0))

        s, zsel = jax.lax.fori_loop(
            0, num_classes, reduce_body,
            (jnp.zeros((h, w), jnp.float32), jnp.zeros((h, w), jnp.float32)))
        dw_ref[0, 0, q] = jnp.where(
            lbl != ignore_index, (m + jnp.log(s) - zsel) * gs, 0.0)


# ---------------------------------------------------------------------------
# host-side plumbing
# ---------------------------------------------------------------------------

def _factors(logits, labels):
    b, h, w, _ = logits.shape
    bh, bw = labels.shape[1], labels.shape[2]
    if bh % h or bw % w:
        raise ValueError(f"{logits.shape} -> {labels.shape} is not an "
                         "integer-factor upsample")
    return bh // h, bw // w


def _phase_major(a, fh, fw):
    """[B, H, W] -> [B, fh, fw, h, w] with ph[b,p,q,i,j] = a[b, i*fh+p, j*fw+q]."""
    b = a.shape[0]
    h, w = a.shape[1] // fh, a.shape[2] // fw
    return a.reshape(b, h, fh, w, fw).transpose(0, 2, 4, 1, 3)


def _phase_major_inv(ph):
    b, fh, fw, h, w = ph.shape
    return ph.transpose(0, 3, 1, 4, 2).reshape(b, h * fh, w * fw)


def _common(logits, labels, fh, fw):
    b, h, w, c = logits.shape
    xt = jnp.transpose(logits.astype(jnp.float32), (0, 3, 1, 2))
    lbl = _phase_major(labels.astype(jnp.int32), fh, fw)
    x_spec = pl.BlockSpec((1, c, h, w), lambda i, p: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    ph_spec = pl.BlockSpec((1, 1, fw, h, w), lambda i, p: (i, p, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    return xt, lbl, x_spec, ph_spec


def _fwd_call(logits, labels, weight, ignore_index, interpret):
    fh, fw = _factors(logits, labels)
    b, h, w, c = logits.shape
    xt, lbl, x_spec, ph_spec = _common(logits, labels, fh, fw)
    kernel = partial(_ce_fwd_kernel, fh=fh, fw=fw, num_classes=c,
                     ignore_index=ignore_index, has_weight=weight is not None)
    in_specs = [x_spec, ph_spec]
    args = [xt, lbl]
    if weight is not None:
        in_specs.append(ph_spec)
        args.append(_phase_major(weight.astype(jnp.float32), fh, fw))
    else:
        kernel = partial(_nw_adapter, kernel)
    partials = pl.pallas_call(
        kernel,
        grid=(b, fh),
        in_specs=in_specs,
        # trailing (1, 1) dims: the Mosaic block rule wants the last two
        # block dims divisible by (8, 128) or equal to the array dims
        out_specs=pl.BlockSpec((1, 1, 1, 1), lambda i, p: (i, p, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, fh, 1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, h, w), jnp.float32)],
        interpret=interpret,
    )(*args)
    return jnp.sum(partials) / (b * h * fh * w * fw)


def _nw_adapter(kernel, x_ref, lbl_ref, *rest):
    return kernel(x_ref, lbl_ref, None, *rest)


def _bwd_dx_call(g, logits, labels, weight, ignore_index, interpret):
    fh, fw = _factors(logits, labels)
    b, h, w, c = logits.shape
    xt, lbl, x_spec, ph_spec = _common(logits, labels, fh, fw)
    gs = jnp.reshape(g.astype(jnp.float32) / (b * h * fh * w * fw), (1, 1))
    kernel = partial(_ce_bwd_kernel, fh=fh, fw=fw, num_classes=c,
                     ignore_index=ignore_index, has_weight=weight is not None)
    g_spec = pl.BlockSpec((1, 1), lambda i, p: (0, 0),
                          memory_space=pltpu.SMEM)
    in_specs = [g_spec, x_spec, ph_spec]
    args = [gs, xt, lbl]
    if weight is not None:
        in_specs.append(ph_spec)
        args.append(_phase_major(weight.astype(jnp.float32), fh, fw))
    else:
        kernel = partial(_nw_bwd_adapter, kernel)
    dxt = pl.pallas_call(
        kernel,
        grid=(b, fh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c, h, w), lambda i, p: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, h, w), jnp.float32),
                        pltpu.VMEM((c, h, w), jnp.float32)],
        interpret=interpret,
    )(*args)
    return jnp.transpose(dxt, (0, 2, 3, 1)).astype(logits.dtype)


def _nw_bwd_adapter(kernel, g_ref, x_ref, lbl_ref, *rest):
    return kernel(g_ref, x_ref, lbl_ref, None, *rest)


def _bwd_dw_call(g, logits, labels, ignore_index, interpret):
    fh, fw = _factors(logits, labels)
    b, h, w, c = logits.shape
    xt, lbl, x_spec, ph_spec = _common(logits, labels, fh, fw)
    gs = jnp.reshape(g.astype(jnp.float32) / (b * h * fh * w * fw), (1, 1))
    kernel = partial(_ce_dw_kernel, fh=fh, fw=fw, num_classes=c,
                     ignore_index=ignore_index)
    dw_ph = pl.pallas_call(
        kernel,
        grid=(b, fh),
        in_specs=[pl.BlockSpec((1, 1), lambda i, p: (0, 0),
                               memory_space=pltpu.SMEM), x_spec, ph_spec],
        out_specs=pl.BlockSpec((1, 1, fw, h, w), lambda i, p: (i, p, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, fh, fw, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, h, w), jnp.float32)],
        interpret=interpret,
    )(gs, xt, lbl)
    return _phase_major_inv(dw_ph)


_INT_ZERO = partial(np.zeros, dtype=jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_ce_w(ignore_index, interpret, logits, labels, weight):
    return _fwd_call(logits, labels, weight, ignore_index, interpret)


def _fused_ce_w_fwd(ignore_index, interpret, logits, labels, weight):
    return (_fwd_call(logits, labels, weight, ignore_index, interpret),
            (logits, labels, weight))


def _fused_ce_w_bwd(ignore_index, interpret, res, g):
    logits, labels, weight = res
    dx = _bwd_dx_call(g, logits, labels, weight, ignore_index, interpret)
    dw = _bwd_dw_call(g, logits, labels, ignore_index, interpret)
    return dx, _INT_ZERO(labels.shape), dw.astype(weight.dtype)


_fused_ce_w.defvjp(_fused_ce_w_fwd, _fused_ce_w_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_ce_nw(ignore_index, interpret, logits, labels):
    return _fwd_call(logits, labels, None, ignore_index, interpret)


def _fused_ce_nw_fwd(ignore_index, interpret, logits, labels):
    return (_fwd_call(logits, labels, None, ignore_index, interpret),
            (logits, labels))


def _fused_ce_nw_bwd(ignore_index, interpret, res, g):
    logits, labels = res
    dx = _bwd_dx_call(g, logits, labels, None, ignore_index, interpret)
    return dx, _INT_ZERO(labels.shape)


_fused_ce_nw.defvjp(_fused_ce_nw_fwd, _fused_ce_nw_bwd)


def supported_geometry(logits_shape, out_size) -> bool:
    """Whether the phase kernels handle this coarse->fine geometry."""
    if len(logits_shape) != 4:
        return False
    _, h, w, _ = logits_shape
    if out_size[0] % h or out_size[1] % w:
        return False
    fh, fw = out_size[0] // h, out_size[1] // w
    # an actual upsample, with lane/sublane-friendly coarse tiles
    return fh * fw > 1 and h % 8 == 0 and w % 128 == 0


def supported(logits, labels) -> bool:
    """Whether ``fused_resize_ce`` handles this (logits, labels) geometry."""
    if logits.ndim != 4 or labels.ndim != 3:
        return False
    if labels.shape[0] != logits.shape[0]:
        return False
    return supported_geometry(logits.shape, labels.shape[1:3])


def fused_resize_ce(logits, labels, weight=None, *, ignore_index: int = 255,
                    interpret: bool | None = None):
    """== weighted_cross_entropy(resize_bilinear(logits, labels.shape[1:3]),
    labels, weight, ignore_index=ignore_index) with the fine logits kept in
    VMEM.  logits [B,h,w,C] (any float dtype; math in f32 like the XLA
    path), labels [B,H,W] int, weight [B,H,W] or None.

    ``interpret=None`` auto-selects the Pallas interpreter off-TPU so the
    same call sites run (and are parity-tested) on CPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if weight is None:
        return _fused_ce_nw(ignore_index, interpret, logits, labels)
    return _fused_ce_w(ignore_index, interpret, logits, labels, weight)


# ---------------------------------------------------------------------------
# fused upsample + argmax/max-softmax (teacher pseudo-label / accuracy path)
# ---------------------------------------------------------------------------

def _argmax_kernel(x_ref, lbl_ref, prob_ref, z_ref, *,
                   fh, fw, num_classes, with_prob):
    """Per phase: label = argmax_c upsample(x), prob = max_c softmax —
    the teacher pseudo-label contract (reference mmseg/models/uda/dacs.py:
    701-711: softmax -> max/argmax of the input-res logits) without the
    fine logits leaving VMEM.  Ties break to the first class, matching
    jnp.argmax."""
    p = pl.program_id(1)
    wr = _phase_weights(p, fh)
    h, w = x_ref.shape[2], x_ref.shape[3]
    for q in range(fw):
        m = _fill_phase_logits(x_ref, z_ref, wr, _phase_weights(q, fw),
                               num_classes, h, w)

        def arg_body(c, am):
            # strict equality on the already-computed running max keeps the
            # FIRST argmax on ties (c ascending), like jnp.argmax
            return jnp.where((z_ref[c] == m) & (am < 0), c, am)

        am = jax.lax.fori_loop(0, num_classes, arg_body,
                               jnp.full((h, w), -1, jnp.int32))
        lbl_ref[0, 0, q] = am
        if with_prob:
            def sum_body(c, s):
                return s + jnp.exp(z_ref[c] - m)

            s = jax.lax.fori_loop(0, num_classes, sum_body,
                                  jnp.zeros((h, w), jnp.float32))
            prob_ref[0, 0, q] = 1.0 / s   # exp(m - lse) = 1/sum exp(z-m)


def _argmax_prob_adapter(kernel, x_ref, lbl_ref, z_ref):
    return kernel(x_ref, lbl_ref, None, z_ref)


def fused_resize_argmax(logits, out_size, *, with_prob: bool = True,
                        interpret: bool | None = None):
    """(argmax, max-softmax-prob) of the bilinear upsample of ``logits``
    to ``out_size`` — == (jnp.argmax(softmax(resize(x)), -1),
    jnp.max(softmax(resize(x)), -1)) with the resized logits kept in VMEM.
    Returns (label int32 [B,H,W], prob f32 [B,H,W] or None)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = logits.shape
    hh, ww = out_size
    if hh % h or ww % w:
        raise ValueError(f"{logits.shape} -> {out_size} not integer-factor")
    fh, fw = hh // h, ww // w
    xt = jnp.transpose(
        jax.lax.stop_gradient(logits).astype(jnp.float32), (0, 3, 1, 2))
    x_spec = pl.BlockSpec((1, c, h, w), lambda i, p: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    ph_spec = pl.BlockSpec((1, 1, fw, h, w), lambda i, p: (i, p, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    kernel = partial(_argmax_kernel, fh=fh, fw=fw, num_classes=c,
                     with_prob=with_prob)
    out_shape = [jax.ShapeDtypeStruct((b, fh, fw, h, w), jnp.int32)]
    out_specs = [ph_spec]
    if with_prob:
        out_shape.append(jax.ShapeDtypeStruct((b, fh, fw, h, w), jnp.float32))
        out_specs.append(ph_spec)
    else:
        kernel = partial(_argmax_prob_adapter, kernel)
    out = pl.pallas_call(
        kernel,
        grid=(b, fh),
        in_specs=[x_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((c, h, w), jnp.float32)],
        interpret=interpret,
    )(xt)
    label = _phase_major_inv(out[0])
    prob = _phase_major_inv(out[1]) if with_prob else None
    return label, prob
