"""Microbenchmark: fused Pallas upsample+CE kernel vs the XLA chain.

Times value_and_grad of the per-stream loss contract — bilinear upsample of
stride-4 logits to label resolution + weighted softmax CE mean (reference
mmseg/models/decode_heads/decode_head.py:221-239) — at the flagship shape
[8,128,128,19] -> [8,512,512], comparing:

  * xla:    jax.checkpoint(weighted_cross_entropy(resize_bilinear(x), ...))
            (the production path before r4)
  * pallas: ops/pallas_ce.fused_resize_ce (custom-VJP Pallas kernel)

Axon-tunnel timing rules (docs/PERF.md): the timed loop is ONE jitted
fori_loop carrying a data dependency (x <- x + eps*dx), and the warmup ends
in a host fetch.

Usage: python tools/bench_ce.py [--batch 8] [--iters 50] [--weight]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--classes", type=int, default=19)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--no-weight", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cmda_tpu.ops.losses import weighted_cross_entropy
    from cmda_tpu.ops.pallas_ce import fused_resize_ce
    from cmda_tpu.ops.resize import resize_bilinear
    from cmda_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    b, h, w, c, f = args.batch, args.h, args.w, args.classes, args.factor
    hh, ww = h * f, w * f
    g = np.random.default_rng(0)
    x0 = jnp.asarray(g.normal(size=(b, h, w, c)).astype(np.float32))
    lbl = jnp.asarray(g.integers(0, c, size=(b, hh, ww)).astype(np.int32))
    wgt = (None if args.no_weight else
           jnp.asarray(g.uniform(0, 1, size=(b, hh, ww)).astype(np.float32)))

    def xla_loss(x):
        @jax.checkpoint
        def ce(xx):
            return weighted_cross_entropy(
                resize_bilinear(xx, (hh, ww)), lbl, wgt)
        return ce(x)

    def pallas_loss(x):
        return fused_resize_ce(x, lbl, wgt)

    results = {}
    for name, loss_fn in (("xla", xla_loss), ("pallas", pallas_loss)):
        grad_fn = jax.value_and_grad(loss_fn)

        @jax.jit
        def chained(x, n):
            def body(_, carry):
                xx, acc = carry
                val, dx = grad_fn(xx)
                return xx + 1e-6 * dx, acc + val
            return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))

        # warmup MUST end in a host fetch (axon rule)
        xw, accw = chained(x0, 2)
        np.asarray(accw)
        t0 = time.perf_counter()
        xo, acc = chained(x0, args.iters)
        acc_host = float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        print(f"{name:7s} {dt*1e3:8.3f} ms/value_and_grad   "
              f"(acc={acc_host:.4f})", flush=True)

    print(f"speedup pallas vs xla: {results['xla']/results['pallas']:.2f}x")


if __name__ == "__main__":
    main()
