"""Prefetching input pipeline.

Replaces torch DataLoader workers (reference mmseg/datasets/builder.py:94-194)
with a thread-pool + double-buffered prefetch queue feeding numpy batches;
``device_put_batch`` overlaps H2D with compute via ``jax.device_put`` onto
(optionally) a sharded layout.  Per-worker deterministic seeding mirrors the
reference's ``worker_init_fn`` intent (builder.py:180-194).
"""
from __future__ import annotations

import queue
import random
import threading

import numpy as np


def collate(samples: list) -> dict:
    """List of nested dicts of numpy arrays -> nested dict of stacked arrays.

    Preallocates the batch and ``np.copyto``s each sample instead of
    ``np.stack``: identical for contiguous samples, ~2x faster for the
    stride-0 broadcast views the datasets ship for mono->3-channel streams
    (ISR/events/IC), which np.stack copies element-wise.

    Mono streams stay mono THROUGH the batch: when every sample in the
    slot is a stride-0 broadcast over its last axis (channels provably
    identical), the batch is stored as one contiguous [B, ..., 1] buffer
    re-broadcast to [B, ..., C] — a read-only view downstream consumers
    treat exactly like a dense batch, while ``data.wire.encode_wire`` can
    detect ``strides[-1] == 0`` and ship a single channel."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: collate([s[k] for s in samples]) for k in first}
    first = np.asarray(first)
    if (first.ndim >= 1 and first.shape[-1] > 1 and first.strides[-1] == 0
            and all(np.asarray(s).strides[-1] == 0 for s in samples)):
        out = np.empty((len(samples),) + first.shape[:-1] + (1,), first.dtype)
        for j, s in enumerate(samples):
            np.copyto(out[j], np.asarray(s)[..., :1])
        return np.broadcast_to(out, (len(samples),) + first.shape)
    out = np.empty((len(samples),) + first.shape, first.dtype)
    for j, s in enumerate(samples):
        np.copyto(out[j], s)
    return out


class PrefetchLoader:
    """Infinite batched loader with background workers.

    dataset[i] -> nested dict of numpy arrays. Batches are drawn with
    replacement over the dataset (iteration-based training).

    Deterministic given (seed, num_workers): each worker owns a private
    seeded RNG and its own bounded queue; the consumer round-robins across
    worker queues, so the batch stream never depends on thread scheduling —
    the same delivery discipline as torch's DataLoader with seeded workers
    (reference mmseg/datasets/builder.py:180-194)."""

    def __init__(self, dataset, batch_size: int, *, num_workers: int = 4,
                 prefetch: int = 4, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self._stop = threading.Event()
        self._seed = seed
        n_workers = max(num_workers, 1)
        self.queues = [queue.Queue(maxsize=max(prefetch, 1))
                       for _ in range(n_workers)]
        self._next_q = 0
        self.workers = [
            threading.Thread(target=self._worker, args=(w,), daemon=True)
            for w in range(n_workers)]
        for w in self.workers:
            w.start()

    def _worker(self, wid: int):
        rng = random.Random(self._seed * 1000 + wid)
        n = len(self.dataset)
        out = self.queues[wid]
        # datasets expose load(idx, rng=...) so every random draw (crop,
        # flip, RCS pick) comes from this worker's private stream — the
        # reference seeds torch workers the same way (builder.py:180-194)
        fetch = getattr(self.dataset, "load", None)
        while not self._stop.is_set():
            idxs = [rng.randrange(n) for _ in range(self.batch_size)]
            # transient sample failures (e.g. an HDF5 read hiccup under
            # thread contention) must not kill a 10k-iter run: retry the
            # batch a few times (fresh random draws) before surfacing
            for attempt in range(3):
                try:
                    if fetch is not None:
                        batch = collate([fetch(i, rng=rng) for i in idxs])
                    else:
                        batch = collate([self.dataset[i] for i in idxs])
                    break
                except Exception as e:  # surface persistent errors
                    batch = e
                    idxs = [rng.randrange(n) for _ in range(self.batch_size)]
                    import time as _time
                    _time.sleep(0.2 * (attempt + 1))
            while not self._stop.is_set():
                try:
                    out.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self.queues[self._next_q].get()
        self._next_q = (self._next_q + 1) % len(self.queues)
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so workers blocked on put() can observe _stop and exit
        for q in self.queues:
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def device_put_batch(batch, sharding=None):
    import jax
    if sharding is None:
        return jax.tree.map(jax.device_put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
