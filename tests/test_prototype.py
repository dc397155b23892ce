"""Prototype bank + pixel contrast loss tests."""
import numpy as np

import jax
import jax.numpy as jnp

from cmda_tpu.uda.prototype import (
    PrototypeBank, class_mean_features, update_prototypes,
    ContrastQueues, enqueue, pixel_contrast_loss,
)


def test_class_mean_features():
    b, h, w, d, k = 2, 8, 8, 4, 19
    g = np.random.default_rng(0)
    feats = jnp.asarray(g.normal(size=(b, h, w, d)).astype(np.float32))
    logits = jnp.zeros((b, h, w, k)).at[..., 3].set(10.0)  # everything class 3
    means, valid = class_mean_features(feats, logits)
    assert means.shape == (b, k, d)
    assert bool(valid[0, 3]) and not bool(valid[0, 5])
    np.testing.assert_allclose(np.asarray(means[0, 3]),
                               np.asarray(feats[0].mean((0, 1))), atol=1e-5)


def test_update_prototypes_mean_then_ema():
    bank = PrototypeBank.create(num_classes=3, dim=2)
    means = jnp.asarray([[[1.0, 1.0], [0, 0], [0, 0]]])
    valid = jnp.asarray([[True, False, False]])
    bank = update_prototypes(bank, means, valid)
    np.testing.assert_allclose(np.asarray(bank.protos[0]), [1.0, 1.0])
    assert float(bank.counts[0]) == 1.0
    means2 = jnp.asarray([[[3.0, 3.0], [0, 0], [0, 0]]])
    bank = update_prototypes(bank, means2, valid)
    np.testing.assert_allclose(np.asarray(bank.protos[0]), [2.0, 2.0])  # mean phase


def test_enqueue_and_contrast_loss():
    rng = jax.random.PRNGKey(0)
    queues = ContrastQueues.create(rng, num_classes=5, memory_size=16, dim=8)
    g = np.random.default_rng(1)
    feats = jnp.asarray(g.normal(size=(1, 16, 16, 8)).astype(np.float32))
    labels = jnp.asarray(g.integers(0, 5, size=(1, 64, 64)).astype(np.int32))
    q2 = enqueue(queues, feats, labels, rng, pixel_update_freq=4)
    assert not np.allclose(np.asarray(q2.segment_queue),
                           np.asarray(queues.segment_queue))
    # ring pointers advanced for present classes
    assert int(jnp.sum(q2.segment_ptr)) > 0

    pred = jnp.asarray(g.integers(0, 5, size=(1, 16, 16)).astype(np.int32))
    queue = jnp.concatenate([q2.segment_queue, q2.pixel_queue], axis=1)
    loss = pixel_contrast_loss(rng, feats, labels, pred, queue,
                               n_view=8, num_classes=5)
    assert np.isfinite(float(loss)) and float(loss) >= 0.0


def test_contrast_loss_prefers_aligned_queue():
    """Anchors identical to their class queue rows -> lower loss than random."""
    rng = jax.random.PRNGKey(2)
    k, q, d = 4, 8, 16
    g = np.random.default_rng(3)
    class_dirs = np.linalg.qr(g.normal(size=(d, d)))[0][:k]
    queue = jnp.asarray(np.repeat(class_dirs[:, None, :], q, axis=1).astype(np.float32))
    h = w = 8
    labels = np.zeros((1, h, w), np.int32)
    labels[:, :, w // 2:] = 1
    feats = class_dirs[labels[0].reshape(-1)].reshape(1, h, w, d)
    pred = jnp.asarray(labels)
    aligned = float(pixel_contrast_loss(
        rng, jnp.asarray(feats.astype(np.float32)), jnp.asarray(labels),
        pred, queue, n_view=4, num_classes=k))
    noise = jnp.asarray(g.normal(size=(1, h, w, d)).astype(np.float32))
    random_loss = float(pixel_contrast_loss(
        rng, noise, jnp.asarray(labels), pred, queue, n_view=4,
        num_classes=k))
    assert aligned < random_loss
