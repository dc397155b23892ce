"""Segmentation losses.

Behavioral contract:
  * ``weighted_cross_entropy`` == the reference CE path
    (reference mmseg/models/losses/cross_entropy_loss.py:11-34 +
    mmseg/models/losses/utils.py weight_reduce_loss): per-pixel CE with
    zero loss at ignore_index, multiplied by the per-pixel ``weight``,
    then **mean over all pixels** (including ignored ones — the
    denominator is B*H*W, matching F.cross_entropy(reduction='none')
    followed by ``.mean()``).
  * ``pixel_accuracy`` == reference mmseg/models/losses/accuracy.py:6-60
    (top-1): 100 * sum(argmax==label) / numel(label) — the denominator
    includes ignored pixels (they can never match since preds < C).
  * ``charbonnier_loss`` == reference utils/utils.py L1_Charbonnier_loss.

Logits are NHWC [B, H, W, C]; labels NHW int32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _select_class(values: jax.Array, labels: jax.Array) -> jax.Array:
    """values[..., labels] without a gather: one-hot compare + reduce.

    TPU-first: ``take_along_axis`` over the class axis lowers to a
    scalar-unit kCustom gather (~34 ms for [8,512,512,19] on v5e — measured
    r2 profile); the compare+multiply+reduce form runs on the VPU and fuses
    with the surrounding softmax (~sub-ms)."""
    num_classes = values.shape[-1]
    onehot = (labels[..., None]
              == jnp.arange(num_classes, dtype=labels.dtype))
    return jnp.sum(values * onehot.astype(values.dtype), axis=-1)


def weighted_cross_entropy(logits: jax.Array, labels: jax.Array,
                           weight: jax.Array | None = None,
                           ignore_index: int = 255,
                           class_weight: jax.Array | None = None) -> jax.Array:
    """Mean per-pixel CE with pixel weights, torch-parity reduction."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -_select_class(logp, safe_labels)
    if class_weight is not None:
        cw = _select_class(
            jnp.broadcast_to(class_weight,
                             safe_labels.shape + class_weight.shape),
            safe_labels)
        nll = nll * cw
    nll = jnp.where(valid, nll, 0.0)
    if weight is not None:
        nll = nll * weight.astype(jnp.float32)
    if class_weight is not None:
        # torch F.cross_entropy with class weights normalizes by the summed
        # class weight of valid pixels, not the pixel count.
        denom_w = jnp.where(valid, cw, 0.0)
        return jnp.sum(nll) / jnp.maximum(jnp.sum(denom_w), 1e-8)
    return jnp.mean(nll)


def weighted_cross_entropy_stacked(logits: jax.Array, labels: jax.Array,
                                   weight: jax.Array | None = None,
                                   ignore_index: int = 255) -> jax.Array:
    """Per-stream mean CE for S streams sharing one label/weight map.

    ``logits`` [S, B, H, W, C]; ``labels`` [B, H, W]; returns [S] — each
    entry identical to ``weighted_cross_entropy`` on that stream.  One
    softmax/select/reduce chain over the stacked tensor replaces S separate
    kernel chains (the CE/loss bucket was ~7% of the r2 step trace)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -_select_class(logp, safe)            # [S, B, H, W]
    nll = jnp.where(valid, nll, 0.0)
    if weight is not None:
        nll = nll * weight.astype(jnp.float32)
    return jnp.mean(nll, axis=(1, 2, 3))


def pixel_accuracy(logits: jax.Array, labels: jax.Array,
                   ignore_index: int = 255) -> jax.Array:
    """Top-1 accuracy (%), torch-parity denominator (all pixels)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = labels != ignore_index
    correct = jnp.sum((pred == labels) & valid)
    return 100.0 * correct / labels.size


def charbonnier_loss(pred: jax.Array, target: jax.Array,
                     eps: float = 1e-6) -> jax.Array:
    """Robust L1 (Charbonnier): mean(sqrt(diff^2 + eps^2))."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def weighted_binary_cross_entropy(logits: jax.Array, labels: jax.Array,
                                  weight: jax.Array | None = None,
                                  ignore_index: int = 255) -> jax.Array:
    """BCE-with-logits over one-hot-expanded labels (the reference's
    binary_cross_entropy path, cross_entropy_loss.py:59-99): ignored pixels
    contribute zero, mean over all elements."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    onehot = jax.nn.one_hot(jnp.where(valid, labels, 0), num_classes)
    logits = logits.astype(jnp.float32)
    loss = (jnp.maximum(logits, 0) - logits * onehot
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    loss = loss * valid[..., None].astype(jnp.float32)
    if weight is not None:
        loss = loss * weight[..., None].astype(jnp.float32)
    return jnp.mean(loss)


def ohem_weights(logits: jax.Array, labels: jax.Array, *,
                 thresh: float | None = 0.7, min_kept: int = 100000,
                 ignore_index: int = 255) -> jax.Array:
    """Online Hard Example Mining pixel weights (reference
    mmseg/core/seg/sampler/ohem_pixel_sampler.py): per image, select valid
    pixels whose GT-class probability is below a threshold, keeping at least
    ``min_kept`` hardest ones. Returns a 0/1 weight map [B, H, W]."""
    b = logits.shape[0]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gt_prob = _select_class(prob, safe)
    gt_prob = jnp.where(valid, gt_prob, jnp.inf)
    flat = gt_prob.reshape(b, -1)
    k = min(min_kept, flat.shape[1])
    kth = jnp.sort(flat, axis=1)[:, k - 1]           # per-image k-th prob
    cutoff = jnp.maximum(kth, thresh if thresh is not None else 0.0)
    sel = flat <= cutoff[:, None]
    return (sel.reshape(labels.shape) & valid).astype(jnp.float32)
