"""Decoded-frame LRU cache for the host loaders.

The loader pipelines are draw-randomized strictly AFTER decode: crop, flip,
flare/sky augments, ISR, and voxelization all act on the decoded base frame
(reference builder.py worker loop + cityscapes_ic.py/dsec.py __getitem__),
so memoizing the decode+fixed-resize prefix is semantically transparent —
every sample distribution is bit-identical with the cache on or off
(tests/test_data.py::test_decode_cache_parity).

Capacity is counted in entries (one decoded frame each, ~1.5-2.5 MB at
1024x512) and is 0 (off) by default; `data.decode_cache` wires it through
the CLIs. It exists because per-sample host decode cost is pure repeat
work on datasets that are small relative to the iteration budget, and the
immutable side tables (DSEC events-index txt, rectify maps) were being
re-parsed EVERY draw regardless of dataset size.
"""
from __future__ import annotations

import threading
from collections import OrderedDict


class DecodeCache:
    """Tiny thread-safe LRU: ``get(key, fn)`` returns the cached value or
    computes+stores it. capacity<=0 disables caching entirely."""

    def __init__(self, capacity: int = 0):
        self.capacity = int(capacity)
        self._d: OrderedDict = OrderedDict()
        self._lock = threading.Lock()

    def get(self, key, fn):
        if self.capacity <= 0:
            return fn()
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
                return self._d[key]
        val = fn()   # compute outside the lock (decode can be slow)
        with self._lock:
            self._d[key] = val
            self._d.move_to_end(key)
            while len(self._d) > self.capacity:
                self._d.popitem(last=False)
        return val
