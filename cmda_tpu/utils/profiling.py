"""Profiling / tracing utilities (the reference has none — SURVEY §5.1).

``trace(dir)``: context manager around jax.profiler (view in XProf/
TensorBoard). ``StepTimer``: wall-clock per-step stats with device sync.
``device_memory_stats``: live HBM usage of the default device.
"""
from __future__ import annotations

import contextlib
import time

import jax


def enable_compile_cache(cache_dir: str | None = None):
    """Persistent XLA compilation cache — repeat CLI/bench/driver runs skip
    the multi-minute b5 compiles (cuts warmup 457s -> ~137s measured)."""
    import os
    cache_dir = cache_dir or os.path.expanduser("~/.cache/cmda_tpu_xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates synchronized per-step wall times."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {"mean_s": sum(ts) / n, "p50_s": ts[n // 2],
                "min_s": ts[0], "max_s": ts[-1], "steps": n}


def device_memory_stats(device=None) -> dict:
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {"bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit")}
