"""Prototype bank + pixel contrastive loss (DACSImage auxiliary machinery).

Behavioral contract (reference mmseg/models/uda/prototype_contrast.py):
  * ``Prototype`` (:7-88): per-(domain, stream) class-mean feature vectors,
    plain average for the first 100 updates then an EMA with momentum
    0.9999 applied as proto*(1-m) + m*vector (sic — the reference weights
    the incoming vector by m); classes with < 10 predicted pixels skipped.
  * ``PixelContrastLoss`` (:91-240): supervised InfoNCE over per-class
    anchor pixel features (half "hard" pred==c&label!=c, half "easy"),
    negatives from a memory queue; temperature scaling with max-logit
    stabilization and self-masking.
  * ``ContrastCELoss`` queues (:243-342): per-class segment queue (mean
    feature per image) and pixel queue (up to pixel_update_freq random
    pixels), ring-buffer updates.

TPU-native redesign: everything is static-shape. Anchor sampling picks a
fixed ``n_view`` pixels per (sample, class) by top-k of random scores over
eligible pixels with validity masks (classes with too few pixels contribute
zero loss); queue updates are fixed-K masked ring writes under jit.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct


class PrototypeBank(struct.PyTreeNode):
    protos: jax.Array      # [K, D]
    counts: jax.Array      # [K]

    @classmethod
    def create(cls, num_classes=19, dim=256):
        return cls(protos=jnp.zeros((num_classes, dim), jnp.float32),
                   counts=jnp.zeros((num_classes,), jnp.float32))


def class_mean_features(feats, logits, labels=None, *, num_classes=19,
                        min_pixels=10):
    """Per-class mean of ``feats`` over predicted pixels (optionally gated by
    the ground-truth label). feats [B,h,w,D], logits [B,h,w,K],
    labels [B,h,w] or None. Returns (means [B,K,D], valid [B,K])."""
    pred = jnp.argmax(logits, axis=-1)
    onehot = jax.nn.one_hot(pred, num_classes, dtype=feats.dtype)
    if labels is not None:
        lbl_oh = jax.nn.one_hot(
            jnp.where(labels >= num_classes, num_classes, labels),
            num_classes, dtype=feats.dtype)
        onehot = onehot * lbl_oh
    counts = jnp.sum(onehot, axis=(1, 2))                       # [B, K]
    sums = jnp.einsum("bhwk,bhwd->bkd", onehot, feats)
    means = sums / jnp.maximum(counts[..., None], 1.0)
    return means, counts >= min_pixels


def update_prototypes(bank: PrototypeBank, means, valid, *,
                      momentum: float = 0.9999,
                      start_mean_until: int = 100) -> PrototypeBank:
    """Fold a batch of per-sample class means into the bank (reference
    update_single_prototype semantics, vectorized over the batch)."""
    protos, counts = bank.protos, bank.counts
    b = means.shape[0]
    for i in range(b):  # small static loop (batch size)
        v = means[i]
        ok = valid[i][:, None]
        n = counts[:, None]
        mean_upd = (protos * n + v) / (n + 1.0)
        ema_upd = protos * (1.0 - momentum) + momentum * v
        upd = jnp.where(n < start_mean_until, mean_upd, ema_upd)
        protos = jnp.where(ok, upd, protos)
        counts = jnp.minimum(counts + valid[i].astype(jnp.float32), 3000.0)
    return bank.replace(protos=protos, counts=counts)


class ContrastQueues(struct.PyTreeNode):
    segment_queue: jax.Array  # [K, M, D] (L2-normalized rows)
    pixel_queue: jax.Array    # [K, M, D]
    segment_ptr: jax.Array    # [K]
    pixel_ptr: jax.Array      # [K]

    @classmethod
    def create(cls, rng, num_classes=19, memory_size=5000, dim=256):
        k1, k2 = jax.random.split(rng)
        sq = jax.random.normal(k1, (num_classes, memory_size, dim))
        pq = jax.random.normal(k2, (num_classes, memory_size, dim))
        norm = lambda q: q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        z = jnp.zeros((num_classes,), jnp.int32)
        return cls(segment_queue=norm(sq), pixel_queue=norm(pq),
                   segment_ptr=z, pixel_ptr=z)


def _l2(x):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def enqueue(queues: ContrastQueues, feats, labels, rng, *,
            pixel_update_freq: int = 10) -> ContrastQueues:
    """Ring-buffer enqueue of per-class mean + K random pixels per sample.

    feats [B,h,w,D]; labels [B,H,W] (strided down to h,w)."""
    b, h, w, d = feats.shape
    stride = labels.shape[1] // h
    lbl = labels[:, ::stride, ::stride]
    K = queues.segment_queue.shape[0]
    M = queues.segment_queue.shape[1]
    sq, pq = queues.segment_queue, queues.pixel_queue
    sptr, pptr = queues.segment_ptr, queues.pixel_ptr
    flat_f = feats.reshape(b, h * w, d)
    flat_l = lbl.reshape(b, h * w)
    for i in range(b):
        onehot = jax.nn.one_hot(
            jnp.where(flat_l[i] >= K, K, flat_l[i]), K, dtype=feats.dtype)
        cnt = jnp.sum(onehot, axis=0)                    # [K]
        present = cnt > 0
        seg_feat = _l2((onehot.T @ flat_f[i]) / jnp.maximum(cnt[:, None], 1.0))
        # segment queue write at ptr
        sq = _ring_write(sq, sptr, seg_feat, present)
        sptr = jnp.where(present, (sptr + 1) % M, sptr)
        # pixel queue: up to pixel_update_freq random pixels per class
        scores = jax.random.uniform(jax.random.fold_in(rng, i), (h * w,))
        for k_off in range(pixel_update_freq):
            # pick the k_off-th highest-scoring pixel of each class
            masked = scores[None, :] * onehot.T - (1 - onehot.T)
            idx = jnp.argsort(masked, axis=1)[:, -(k_off + 1)]     # [K]
            feat_k = _l2(flat_f[i][idx])
            ok = present & (cnt > k_off)
            pq = _ring_write(pq, pptr, feat_k, ok)
            pptr = jnp.where(ok, (pptr + 1) % M, pptr)
    return queues.replace(segment_queue=sq, pixel_queue=pq,
                          segment_ptr=sptr, pixel_ptr=pptr)


def _ring_write(queue, ptr, rows, ok):
    """queue [K,M,D]; write rows[k] at queue[k, ptr[k]] where ok[k]."""
    K, M, D = queue.shape
    onehot = jax.nn.one_hot(ptr, M, dtype=queue.dtype)          # [K, M]
    onehot = onehot * ok.astype(queue.dtype)[:, None]
    return queue * (1 - onehot[..., None]) + onehot[..., None] * rows[:, None, :]


def pixel_contrast_loss(rng, feats, labels, predict, queue, *,
                        temperature: float = 0.1,
                        base_temperature: float = 0.07,
                        n_view: int = 32, num_classes: int = 19,
                        ignore_index: int = 255):
    """Static-shape supervised InfoNCE (reference PixelContrastLoss).

    feats [B,h,w,D] (L2-normalized here); labels [B,H,W] downsampled
    (nearest) to h,w; predict [B,h,w] argmax predictions; queue [K,Q,D].
    Anchors: per (sample, class) a fixed n_view pixels, half preferring
    "hard" (pred==c, label!=c), half "easy" (both==c), masked invalid."""
    b, h, w, d = feats.shape
    stride = labels.shape[1] // h
    lbl = labels[:, ::stride, ::stride].reshape(b, h * w)
    pred = predict.reshape(b, h * w)
    f = _l2(feats.reshape(b, h * w, d))

    def sample_anchor(bi, c, key):
        is_c_pred = pred[bi] == c
        easy = is_c_pred & (lbl[bi] == c)
        hard = is_c_pred & (lbl[bi] != c) & (lbl[bi] != ignore_index)
        score = jax.random.uniform(key, (h * w,))
        half = n_view // 2
        hard_rank = jnp.argsort(jnp.where(hard, score, -1.0))[::-1][:half]
        easy_rank = jnp.argsort(jnp.where(easy, score, -1.0))[::-1][:n_view - half]
        idx = jnp.concatenate([hard_rank, easy_rank])
        ok = jnp.concatenate([
            jnp.arange(half) < jnp.sum(hard),
            jnp.arange(n_view - half) < jnp.sum(easy)])
        valid_class = (jnp.sum(easy) + jnp.sum(hard)) > n_view
        return f[bi][idx], ok & valid_class, jnp.full((n_view,), c)

    keys = jax.random.split(rng, b * num_classes).reshape(b, num_classes, 2)
    anchors, ok, ys = [], [], []
    for bi in range(b):
        for c in range(num_classes):
            a, o, y = sample_anchor(bi, c, keys[bi, c])
            anchors.append(a); ok.append(o); ys.append(y)
    A = jnp.concatenate(anchors)           # [N, D]
    Aok = jnp.concatenate(ok)              # [N]
    Ay = jnp.concatenate(ys)               # [N]

    # contrast set: the queue, skipping class 0 (reference _sample_negative)
    Kq, Q, _ = queue.shape
    Cy = jnp.repeat(jnp.arange(Kq), Q)
    C = queue.reshape(Kq * Q, d)
    cmask = (Cy != 0).astype(jnp.float32)

    logits = (A @ C.T) / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, 1, keepdims=True))
    pos = (Ay[:, None] == Cy[None, :]).astype(jnp.float32) * cmask
    neg = (1.0 - (Ay[:, None] == Cy[None, :]).astype(jnp.float32)) * cmask
    exp_logits = jnp.exp(logits) * cmask
    neg_sum = jnp.sum(exp_logits * neg, 1, keepdims=True)
    log_prob = logits - jnp.log(exp_logits + neg_sum + 1e-12)
    mean_log_prob_pos = jnp.sum(pos * log_prob, 1) / jnp.maximum(
        jnp.sum(pos, 1), 1.0)
    per_anchor = -(temperature / base_temperature) * mean_log_prob_pos
    per_anchor = per_anchor * Aok.astype(jnp.float32)
    return jnp.sum(per_anchor) / jnp.maximum(jnp.sum(Aok), 1.0)
