"""Segmented training launcher — a host-memory-leak workaround.

The axon TPU tunnel client leaks every h2d transfer's host staging buffer
(~20-25 MB per training step at 512^2; measured r5 with a bare
``jnp.asarray`` loop, no model code — buffer reuse, gc, explicit
``Array.delete`` and ``malloc_trim`` all change nothing). A 10k-iteration
run therefore grows past 120 GB RSS and gets OOM-killed near iter 5000.

Until the plugin is fixed, long runs go through this launcher: it splits
the run into segments of ``--segment-iters``, each in a fresh process that
exits (freeing the leak) and hands off through the standard
checkpoint/--resume-from path (train/loop.py saves at ``max_iters``
unconditionally, so every segment boundary is a checkpoint).

The per-segment ``--seed`` is offset by the segment index so the loader
workers draw a fresh sample stream each segment instead of replaying the
same prefix (worker RNGs are seeded from the run seed).

Usage (same flags as tools/train.py, plus --segment-iters):

    python tools/train_chunked.py --segment-iters 2000 \
        --config cs2dsec ... --max-iters 10000 --work-dir work_dirs/x
"""
from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys


def latest_checkpoint(work_dir: str):
    if not os.path.isdir(work_dir):
        return None, 0
    best, best_it = None, 0
    for name in os.listdir(work_dir):
        m = re.fullmatch(r"iter_(\d+)", name)
        if m and int(m.group(1)) > best_it:
            best, best_it = os.path.join(work_dir, name), int(m.group(1))
    return best, best_it


def main():
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--segment-iters", type=int, default=2000)
    ap.add_argument("--max-iters", type=int, required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--seed", type=int, default=0)
    args, passthrough = ap.parse_known_args()

    train_py = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "train.py")
    while True:
        ckpt, start = latest_checkpoint(args.work_dir)
        if start >= args.max_iters:
            print(f"[chunked] done at iter {start}")
            return 0
        seg_end = min(start + args.segment_iters, args.max_iters)
        seg_idx = start // max(args.segment_iters, 1)
        cmd = [sys.executable, train_py,
               "--max-iters", str(seg_end),
               "--work-dir", args.work_dir,
               "--seed", str(args.seed + seg_idx)] + passthrough
        if ckpt:
            cmd += ["--resume-from", ckpt]
        print(f"[chunked] segment {start}->{seg_end} "
              f"(seed {args.seed + seg_idx}, resume={ckpt})", flush=True)
        rc = subprocess.call(cmd)
        if rc != 0:
            print(f"[chunked] segment exited rc={rc}", flush=True)
            # one retry per boundary is inherent: if the segment saved its
            # checkpoint before dying, the loop resumes past it; if not,
            # a genuine config error would loop forever — bail
            ckpt2, start2 = latest_checkpoint(args.work_dir)
            if start2 <= start:
                return rc


if __name__ == "__main__":
    sys.exit(main())
