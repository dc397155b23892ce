"""UDA-specific array transforms: the multi-stream loss, pseudo-label
weighting, and label downscaling for the ImageNet feature-distance loss.

Behavioral contracts:
  * ``multi_stream_loss`` == BaseDecodeHeadFusion.forward_train's weighted
    sum (reference mmseg/models/decode_heads/decode_head.py:509-528):
    fusion*w_f + image*w_i, plus isr*w_isr + events*(w_e/2) when the ISR
    stream is active, else events*w_e.  Logits are bilinearly resized to
    label resolution first (:592-596); acc comes from the fusion stream
    (image stream if no fusion).
  * ``pseudo_label_and_weight`` == reference mmseg/models/uda/dacs.py:701-711
    (scalar confidence-ratio weight, optional top/bottom row zeroing).
  * ``downscale_label_ratio`` == reference mmseg/utils/utils.py:18-40
    (majority-pool downsample with purity threshold).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from ..ops.losses import (
    weighted_cross_entropy, weighted_cross_entropy_stacked, pixel_accuracy)
from ..ops.pallas_ce import (
    fused_resize_ce, fused_resize_argmax, supported_geometry)
from ..ops.pallas_ce import supported as pallas_ce_supported
from ..ops.resize import resize_bilinear


def _stream_accuracy(x, label, size, pallas_ce, ignore_index=255):
    """pixel_accuracy(resize_bilinear(x, size), label), optionally through
    the fused phase argmax kernel (the resized logits stay in VMEM)."""
    if pallas_ce and pallas_ce_supported(x, label):
        pred, _ = fused_resize_argmax(x, size, with_prob=False)
        valid = label != ignore_index
        correct = jnp.sum((pred == label) & valid)
        return 100.0 * correct / label.size
    return pixel_accuracy(resize_bilinear(x, size), label)


def multi_stream_loss(logits: dict, label, seg_weight, *, w_image: float,
                      w_events: float, w_fusion: float, w_isr: float,
                      ignore_index: int = 255, stacked: bool = False,
                      pallas_ce: bool = False):
    """logits: dict of stride-4 NHWC streams (None where absent);
    label [B,H,W] int; seg_weight [B,H,W] or None.  Returns (loss, logs).

    ``stacked=True`` (4-stream case only) folds the four per-stream CEs
    into ONE checkpointed resize+CE over the stream-stacked tensor
    (UDAConfig.stacked_stream_ce; parity-tested against the sequential
    path). Same math, one kernel chain instead of four.

    ``pallas_ce=True`` routes each stream CE through the fused Pallas
    upsample+CE kernel (ops/pallas_ce.py; parity-tested values+grads):
    the [B,H,W,C] resized logits never materialize in HBM in either
    direction, replacing the jax.checkpoint form."""
    size = label.shape[1:3]

    # jax.checkpoint: the resized-to-label f32 logits ([B,512,512,19] ~=
    # 160 MB per stream at b8) are recomputed in backward from the
    # stride-4 logits instead of being saved — 4 streams x 2 passes of
    # these were the HBM peak at batch 8 (r3 OOM margin, docs/PERF.md).
    # The Pallas kernel needs neither: its custom VJP recomputes the
    # phase logits in VMEM.
    @jax.checkpoint
    def stream_ce_xla(x):
        return weighted_cross_entropy(
            resize_bilinear(x, size), label, seg_weight,
            ignore_index=ignore_index)

    def stream_ce(x):
        if pallas_ce and pallas_ce_supported(x, label):
            return fused_resize_ce(x, label, seg_weight,
                                   ignore_index=ignore_index)
        return stream_ce_xla(x)

    if (stacked and logits.get("fusion_output") is not None
            and logits.get("events_output") is not None
            and logits.get("img_self_res_output") is not None):

        @jax.checkpoint
        def stacked_ce(xs):            # xs: [4, B, h/4, w/4, C]
            big = resize_bilinear(xs.reshape((-1,) + xs.shape[2:]), size)
            big = big.reshape(xs.shape[:2] + big.shape[1:])
            return weighted_cross_entropy_stacked(
                big, label, seg_weight, ignore_index=ignore_index)

        xs = jnp.stack([logits["image_output"], logits["fusion_output"],
                        logits["events_output"],
                        logits["img_self_res_output"]])
        l_image, l_fusion, l_events, l_isr = stacked_ce(xs)
        loss = (l_image * w_image + l_fusion * w_fusion
                + l_isr * w_isr + l_events * (w_events / 2.0))
        logs = {"loss_image": l_image, "loss_fusion": l_fusion,
                "loss_events": l_events, "loss_isr": l_isr,
                "acc_seg": _stream_accuracy(
                    logits["fusion_output"], label, size, pallas_ce),
                "loss_seg": loss}
        return loss, logs

    l_image = stream_ce(logits["image_output"])
    loss = l_image * w_image
    logs = {"loss_image": l_image}
    if logits.get("fusion_output") is not None:
        l_fusion = stream_ce(logits["fusion_output"])
        loss = loss + l_fusion * w_fusion
        logs["loss_fusion"] = l_fusion
        logs["acc_seg"] = _stream_accuracy(
            logits["fusion_output"], label, size, pallas_ce)
    else:
        logs["acc_seg"] = _stream_accuracy(
            logits["image_output"], label, size, pallas_ce)
    if logits.get("events_output") is not None:
        l_events = stream_ce(logits["events_output"])
        logs["loss_events"] = l_events
        if logits.get("img_self_res_output") is not None:
            l_isr = stream_ce(logits["img_self_res_output"])
            logs["loss_isr"] = l_isr
            loss = loss + l_isr * w_isr + l_events * (w_events / 2.0)
        else:
            loss = loss + l_events * w_events
    logs["loss_seg"] = loss
    return loss, logs


def pseudo_label_and_weight(fusion_logits, *, threshold: float = 0.968,
                            ignore_top: int = 0, ignore_bottom: int = 0):
    """Teacher fusion logits (input-res NHWC) -> (pseudo_label, weight).

    weight = scalar fraction of pixels with max-softmax >= threshold,
    broadcast to [B, H, W], with optional top/bottom rows zeroed."""
    softmax = jax.nn.softmax(fusion_logits.astype(jnp.float32), axis=-1)
    prob = jnp.max(softmax, axis=-1)
    label = jnp.argmax(softmax, axis=-1).astype(jnp.int32)
    ratio = jnp.mean((prob >= threshold).astype(jnp.float32))
    weight = jnp.full(prob.shape, 1.0, jnp.float32) * ratio
    if ignore_top > 0:
        weight = weight.at[:, :ignore_top, :].set(0.0)
    if ignore_bottom > 0:
        weight = weight.at[:, -ignore_bottom:, :].set(0.0)
    return label, weight


def pseudo_label_and_weight_coarse(logits_s4, out_size, *,
                                   threshold: float = 0.968,
                                   ignore_top: int = 0,
                                   ignore_bottom: int = 0,
                                   pallas_ce: bool = False):
    """``pseudo_label_and_weight`` fed stride-4 teacher logits: the
    input-res resize happens inside the fused phase argmax kernel when
    supported (the [B,H,W,C] teacher logits never materialize), else via
    the XLA resize (identical math)."""
    if pallas_ce and supported_geometry(logits_s4.shape, out_size):
        label, prob = fused_resize_argmax(logits_s4, out_size)
        ratio = jnp.mean((prob >= threshold).astype(jnp.float32))
        weight = jnp.full(prob.shape, 1.0, jnp.float32) * ratio
        if ignore_top > 0:
            weight = weight.at[:, :ignore_top, :].set(0.0)
        if ignore_bottom > 0:
            weight = weight.at[:, -ignore_bottom:, :].set(0.0)
        return label, weight
    return pseudo_label_and_weight(
        resize_bilinear(logits_s4, out_size), threshold=threshold,
        ignore_top=ignore_top, ignore_bottom=ignore_bottom)


def downscale_label_ratio(gt, scale_factor: int, min_ratio: float,
                          n_classes: int, ignore_index: int = 255):
    """Majority-pool downsample [B,H,W] -> [B,H/s,W/s] with purity cutoff."""
    assert scale_factor > 1
    ignore_sub = n_classes
    out = jnp.where(gt == ignore_index, ignore_sub, gt)
    onehot = jax.nn.one_hot(out, n_classes + 1, dtype=jnp.float32)
    b, h, w, c = onehot.shape
    s = scale_factor
    pooled = onehot.reshape(b, h // s, s, w // s, s, c).mean(axis=(2, 4))
    ratio = jnp.max(pooled, axis=-1)
    lbl = jnp.argmax(pooled, axis=-1)
    lbl = jnp.where(lbl == ignore_sub, ignore_index, lbl)
    lbl = jnp.where(ratio < min_ratio, ignore_index, lbl)
    return lbl.astype(jnp.int32)


def seg_label_to_edge_label(label, ignore_index: int = 255):
    """Label -> binary edge map (reference dacs_transforms.py:174-183):
    3x3 replicate-padded average != center -> 1; 3x3 max >= ignore -> 0."""
    lf = label.astype(jnp.float32)
    padded = jnp.pad(lf, ((0, 0), (1, 1), (1, 1)), mode="edge")
    win = jax.lax.reduce_window(
        padded, 0.0, jax.lax.add, (1, 3, 3), (1, 1, 1), "VALID") / 9.0
    mx = jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "VALID")
    diff = win - lf
    edge = jnp.where(diff != 0, 1, 0)
    edge = jnp.where(mx >= ignore_index, 0, edge)
    return edge.astype(jnp.int32)


def split_stream_loss(logits: dict, labels: dict, weights: dict, *,
                      w_image: float, w_events: float, factor: float = 2.0,
                      ignore_index: int = 255, events_class_weight=None,
                      pallas_ce: bool = False):
    """Two-stream loss with per-stream labels/weights.

    factor=2: cs2dz_image+raw-isr_split (decode_head.py:501-507, each term
    scaled x2); factor=1: the no-fusion/d2n dict-label path
    (decode_head.py:494-523 with fusion_output None).

    ``events_class_weight``: per-class CE weights for the events stream
    only — the isr_edge_class_weight [1-w, w] edge/no-edge reweighting
    (reference dacs.py:142-146; there it is set on the shared loss, which
    would break the 19-class image stream, so it is scoped here)."""
    size = labels["image"].shape[1:3]

    @jax.checkpoint
    def ce_xla(x, lbl, w, cw=None):
        return weighted_cross_entropy(resize_bilinear(x, size), lbl, w,
                                      ignore_index=ignore_index,
                                      class_weight=cw)

    def ce(x, lbl, w, cw=None):
        # class-weighted CE (isr_edge) keeps the XLA path — the Pallas
        # kernel covers the unweighted-class contract only
        if pallas_ce and cw is None and pallas_ce_supported(x, lbl):
            return fused_resize_ce(x, lbl, w, ignore_index=ignore_index)
        return ce_xla(x, lbl, w, cw)

    l_img = ce(logits["image_output"], labels["image"], weights.get("image"))
    l_ev = ce(logits["events_output"], labels["events"], weights.get("events"),
              events_class_weight)
    loss = l_img * w_image * factor + l_ev * w_events * factor
    logs = {"loss_image": l_img, "loss_events": l_ev, "loss_seg": loss,
            "acc_seg": _stream_accuracy(
                logits["image_output"], labels["image"], size, pallas_ce)}
    return loss, logs


def feature_consistency_loss(f_image, f_target, lam: float):
    """lambda * sum_i MSE(f_image[i], stop_grad(f_target[i]))
    (reference encoder_decoder.py:833-848)."""
    loss = 0.0
    for a, b in zip(f_image, f_target):
        b = jax.lax.stop_gradient(b)
        loss = loss + jnp.mean((a.astype(jnp.float32)
                                - b.astype(jnp.float32)) ** 2)
    return lam * loss


def frozen_variables(params_or_vars):
    """Normalize a frozen net's stored weights into a flax variables dict.

    ``imnet_params``/``cyclegan_params`` historically hold bare ``params``
    (sufficient for MiT — no BatchNorm). Legacy-grid backbones (ResNet/
    ResNeXt/ResNeSt, reference experiments.py:277-396) carry running BN
    statistics, so the frozen ImageNet feature-distance net must be applied
    with its ``batch_stats`` collection too. Accepts either a bare params
    pytree or a full ``{"params": ..., "batch_stats": ...}`` dict.
    """
    known = {"params", "batch_stats"}
    if isinstance(params_or_vars, (dict, FrozenDict)) \
            and "params" in params_or_vars \
            and set(params_or_vars.keys()) <= known:
        return params_or_vars
    return {"params": params_or_vars}


def masked_feat_dist(f_student, f_imnet, mask):
    """Mean L2 norm over channel of the feature difference, over masked
    positions (reference dacs.py:317-326). NHWC features, mask [B,h,w]."""
    diff = f_student.astype(jnp.float32) - f_imnet.astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    m = mask.astype(jnp.float32)
    return jnp.sum(dist * m) / jnp.maximum(jnp.sum(m), 1.0)
