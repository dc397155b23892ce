"""Micro-benchmark of the MiT stage-3 scan (the b5 hot loop).

Chases the r3 profile anomaly: the student's stage-3 fwd scan (45 ms, b8)
vs the teacher's identical scan (17 ms). Times the scan fwd-only and under
grad, with remat on/off and several unroll factors, on the real chip.

Usage: python tools/bench_scan.py [--batch 8] [--tokens 1024] [--dim 320]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, steps=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=1024)   # 32x32 stage-3 grid
    ap.add_argument("--dim", type=int, default=320)
    ap.add_argument("--depth", type=int, default=40)
    ap.add_argument("--heads", type=int, default=5)
    ap.add_argument("--sr", type=int, default=2)
    ap.add_argument("--unrolls", default="1,2,4",
                    help="comma list of scan unroll factors to try")
    ap.add_argument("--split-transpose", default="0",
                    help="comma list of 0/1: lax.scan _split_transpose — "
                         "splits the scan backward into a recompute scan + "
                         "a transpose scan (attacks the grad-stacking DUS "
                         "bucket, 10.5%% of the r2 step trace)")
    args = ap.parse_args()
    unrolls = [int(v) for v in args.unrolls.split(",")]
    splits = [bool(int(v)) for v in args.split_transpose.split(",")]

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from cmda_tpu.models.mit import MiTBlockScan
    from cmda_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    hw = (int(args.tokens ** 0.5),) * 2

    class Stage(nn.Module):
        remat: bool
        unroll: int = 1
        split_transpose: bool = False

        @nn.compact
        def __call__(self, x, dpr, u):
            cls = MiTBlockScan
            if self.remat:
                cls = nn.remat(cls, prevent_cse=False)
            Scan = nn.scan(cls, variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True},
                           in_axes=0, length=args.depth, unroll=self.unroll,
                           _split_transpose=self.split_transpose,
                           metadata_params={nn.meta.PARTITION_NAME: None})
            y, _ = Scan(dim=args.dim, num_heads=args.heads, mlp_ratio=4,
                        sr_ratio=args.sr, qkv_bias=True, drop_rate=0.0,
                        attn_drop_rate=0.0, hw=hw, deterministic=False,
                        dtype=jnp.bfloat16, name="blocks")(x, (dpr, u))
            return y

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(args.batch, args.tokens, args.dim)), jnp.bfloat16)
    dpr = jnp.linspace(0.0, 0.1, args.depth)
    u = jax.random.uniform(rng, (args.depth, 2, args.batch))

    report = {}
    for remat in (True, False):
        for unroll in unrolls:
            for st in splits:
                m = Stage(remat=remat, unroll=unroll, split_transpose=st)
                params = m.init(rng, x, dpr, u)["params"]
                fwd = jax.jit(
                    lambda p, xx: m.apply({"params": p}, xx, dpr, u))
                key = f"remat={int(remat)}_unroll={unroll}_st={int(st)}"
                if not st:   # fwd is unaffected by _split_transpose
                    report[f"fwd_{key}_ms"] = round(
                        timed(fwd, params, x) * 1e3, 2)

                def loss(p, xx):
                    return m.apply({"params": p}, xx, dpr, u).astype(
                        jnp.float32).sum()

                g = jax.jit(jax.grad(loss))
                report[f"grad_{key}_ms"] = round(timed(g, params, x) * 1e3, 2)
                print(json.dumps({k: v for k, v in report.items()
                                  if key in k}), flush=True)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
