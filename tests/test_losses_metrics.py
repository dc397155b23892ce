"""Golden tests: weighted CE / accuracy / mIoU vs torch oracles."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cmda_tpu.ops.losses import weighted_cross_entropy, pixel_accuracy
from cmda_tpu.ops.metrics import (
    intersect_and_union, intersect_and_union_jnp, eval_metrics, summarize_miou,
)


def make_batch(seed=0, b=2, h=16, w=16, c=19):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    labels[rng.random(size=labels.shape) < 0.1] = 255
    weight = rng.random(size=(b, h, w)).astype(np.float32)
    return logits, labels, weight


def torch_ce(logits_nhwc, labels, weight=None):
    pred = torch.as_tensor(logits_nhwc).permute(0, 3, 1, 2)
    lbl = torch.as_tensor(labels).long()
    loss = F.cross_entropy(pred, lbl, reduction="none", ignore_index=255)
    if weight is not None:
        loss = loss * torch.as_tensor(weight)
    return loss.mean().item()


def test_ce_unweighted():
    logits, labels, _ = make_batch()
    ours = float(weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ours - torch_ce(logits, labels)) < 1e-5


def test_ce_weighted():
    logits, labels, weight = make_batch(seed=1)
    ours = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weight)))
    assert abs(ours - torch_ce(logits, labels, weight)) < 1e-5


def test_split_stream_loss_edge_class_weight():
    """events_class_weight [1-w, w] reweights the 2-class edge stream only
    (isr_edge_class_weight, reference dacs.py:142-146) with torch
    F.cross_entropy(weight=...) normalization semantics."""
    from cmda_tpu.uda.transforms import split_stream_loss
    rng = np.random.default_rng(3)
    b, h, w = 2, 8, 8
    img_logits = rng.normal(size=(b, h, w, 19)).astype(np.float32)
    edge_logits = rng.normal(size=(b, h, w, 2)).astype(np.float32)
    img_lbl = rng.integers(0, 19, size=(b, h, w)).astype(np.int32)
    edge_lbl = rng.integers(0, 2, size=(b, h, w)).astype(np.int32)
    cw = [0.1, 0.9]
    loss, logs = split_stream_loss(
        {"image_output": jnp.asarray(img_logits),
         "events_output": jnp.asarray(edge_logits)},
        {"image": jnp.asarray(img_lbl), "events": jnp.asarray(edge_lbl)},
        {}, w_image=0.7, w_events=0.7, factor=1.0,
        events_class_weight=jnp.asarray(cw, jnp.float32))
    l_ev_oracle = F.cross_entropy(
        torch.as_tensor(edge_logits).permute(0, 3, 1, 2),
        torch.as_tensor(edge_lbl).long(),
        weight=torch.tensor(cw)).item()
    assert abs(float(logs["loss_events"]) - l_ev_oracle) < 1e-5
    # the 19-class image stream is untouched by the 2-class weight
    assert abs(float(logs["loss_image"]) - torch_ce(img_logits, img_lbl)) < 1e-5
    assert abs(float(loss)
               - 0.7 * (float(logs["loss_image"]) + l_ev_oracle)) < 1e-5


def test_accuracy_matches_mmseg_denominator():
    logits, labels, _ = make_batch(seed=2)
    pred = torch.as_tensor(logits).permute(0, 3, 1, 2)
    lbl = torch.as_tensor(labels).long()
    top1 = pred.argmax(1)
    oracle = (top1 == lbl).float().sum().item() * 100.0 / lbl.numel()
    ours = float(pixel_accuracy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ours - oracle) < 1e-4


def torch_intersect_union(pred, label, num_classes, ignore_index=255):
    pred = torch.as_tensor(pred)
    label = torch.as_tensor(label)
    mask = label != ignore_index
    pred, label = pred[mask], label[mask]
    inter = pred[pred == label]
    ai = torch.histc(inter.float(), bins=num_classes, min=0, max=num_classes - 1)
    ap = torch.histc(pred.float(), bins=num_classes, min=0, max=num_classes - 1)
    al = torch.histc(label.float(), bins=num_classes, min=0, max=num_classes - 1)
    return ai.numpy(), (ap + al - ai).numpy(), ap.numpy(), al.numpy()


def test_intersect_and_union():
    rng = np.random.default_rng(3)
    pred = rng.integers(0, 19, size=(64, 64)).astype(np.int64)
    label = rng.integers(0, 19, size=(64, 64)).astype(np.int64)
    label[rng.random(size=label.shape) < 0.2] = 255
    o = torch_intersect_union(pred, label, 19)
    ours_np = intersect_and_union(pred, label, 19)
    ours_j = intersect_and_union_jnp(jnp.asarray(pred), jnp.asarray(label), 19)
    for a, b, c in zip(o, ours_np, ours_j):
        np.testing.assert_allclose(b, a)
        np.testing.assert_allclose(np.asarray(c), a)


def test_eval_metrics_miou():
    rng = np.random.default_rng(4)
    pred = rng.integers(0, 5, size=(32, 32))
    label = rng.integers(0, 5, size=(32, 32))
    ai, au, ap, al = intersect_and_union(pred, label, 5)
    ret = eval_metrics(ai, au, ap, al)
    iou_oracle = ai / au
    np.testing.assert_allclose(ret["IoU"], iou_oracle)
    summary = summarize_miou(ret, valid_classes=4)
    assert abs(summary["mIoU_4cls"] - np.nanmean(iou_oracle) * 5 / 4) < 1e-9


def test_stacked_stream_ce_matches_sequential():
    """multi_stream_loss(stacked=True) folds the 4 per-stream CEs into one
    stacked resize+CE chain (uda.stacked_stream_ce perf lever) — values AND
    grads must match the sequential path."""
    import jax
    from cmda_tpu.uda.transforms import multi_stream_loss

    g = np.random.default_rng(11)
    b, hw, c = 2, 16, 19
    logits = {
        k: jnp.asarray(g.normal(size=(b, hw // 4, hw // 4, c))
                       .astype(np.float32))
        for k in ["image_output", "fusion_output", "events_output",
                  "img_self_res_output"]}
    label = jnp.asarray(g.integers(0, c, size=(b, hw, hw)).astype(np.int32))
    label = label.at[0, :3].set(255)
    weight = jnp.asarray(g.random(size=(b, hw, hw)).astype(np.float32))
    kw = dict(w_image=0.5, w_events=0.5, w_fusion=0.7, w_isr=0.25)

    def total(lg, stacked):
        return multi_stream_loss(lg, label, weight, stacked=stacked, **kw)[0]

    l_seq, g_seq = jax.value_and_grad(total)(logits, False)
    l_st, g_st = jax.value_and_grad(total)(logits, True)
    np.testing.assert_allclose(float(l_st), float(l_seq), rtol=1e-6)
    for k in logits:
        np.testing.assert_allclose(np.asarray(g_st[k]), np.asarray(g_seq[k]),
                                   atol=1e-6, rtol=1e-5)
    _, logs_seq = multi_stream_loss(logits, label, weight, stacked=False, **kw)
    _, logs_st = multi_stream_loss(logits, label, weight, stacked=True, **kw)
    for k in logs_seq:
        np.testing.assert_allclose(float(logs_st[k]), float(logs_seq[k]),
                                   rtol=1e-5)
