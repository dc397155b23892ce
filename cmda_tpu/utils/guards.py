"""Regression guards for jit hygiene.

``assert_lean_closure`` protects against the HTTP-413 bug class found at
b5 scale in round 4 (train/loop.py NOTE): a jitted eval/test function that
CLOSES OVER model weights bakes them into the HLO as constants — the axon
remote-compile service rejects the ~0.3 GB request, and on any backend it
bloats the executable and defeats donation. Weights must be jit ARGUMENTS.

The check is pure-Python (walks ``__closure__`` cells recursively, no
tracing), so it costs microseconds and can run unconditionally at every
eval-path jit construction site.
"""
from __future__ import annotations

import numpy as np


class FatClosureError(AssertionError):
    pass


def _leaf_nbytes(x):
    nb = getattr(x, "nbytes", None)
    return int(nb) if isinstance(nb, (int, np.integer)) else 0


def _scan_value(val, limit, path, offenders, seen, depth=0):
    if depth > 6 or id(val) in seen:
        return
    seen.add(id(val))
    nb = _leaf_nbytes(val)
    if nb > limit:
        offenders.append((path, type(val).__name__, nb))
        return
    if isinstance(val, dict):
        for k, v in val.items():
            _scan_value(v, limit, f"{path}[{k!r}]", offenders, seen,
                        depth + 1)
    elif isinstance(val, (list, tuple)):
        for i, v in enumerate(val):
            _scan_value(v, limit, f"{path}[{i}]", offenders, seen, depth + 1)
    elif callable(val) and getattr(val, "__closure__", None):
        _scan_fn(val, limit, offenders, seen, depth + 1)


def _scan_fn(fn, limit, offenders, seen, depth=0):
    closure = getattr(fn, "__closure__", None) or ()
    names = getattr(getattr(fn, "__code__", None), "co_freevars", ())
    for name, cell in zip(names, closure):
        try:
            val = cell.cell_contents
        except ValueError:      # empty cell
            continue
        _scan_value(val, limit, f"{getattr(fn, '__qualname__', fn)}<{name}>",
                    offenders, seen, depth)


def assert_lean_closure(fn, limit_bytes: int = 1 << 20):
    """Raise FatClosureError if ``fn`` (or any function it closes over)
    captures an array — or a pytree containing one — whose single-leaf
    size exceeds ``limit_bytes`` (default 1 MB).

    Call at jit-construction time on the PYTHON function about to be
    jitted (for ``jax.jit(f)`` pass ``f``): model weights captured by
    closure instead of passed as arguments are exactly what this catches.
    """
    target = fn
    while (getattr(target, "__code__", None) is None
           and getattr(target, "__wrapped__", None) is not None):
        target = target.__wrapped__   # unwrap jax.jit / functools.wraps
    offenders = []
    _scan_fn(target, limit_bytes, offenders, set())
    if offenders:
        lines = "\n".join(f"  {p}: {t} of {nb / 1e6:.1f} MB"
                          for p, t, nb in offenders)
        raise FatClosureError(
            "jitted function captures large array(s) by closure — pass "
            "them as jit arguments instead (HTTP-413 guard, "
            f"train/loop.py NOTE):\n{lines}")
    return fn
