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


def _newest_log_mtime(work_dir: str) -> float:
    newest = 0.0
    if os.path.isdir(work_dir):
        for name in os.listdir(work_dir):
            if name.endswith(".log.json"):
                try:
                    newest = max(newest, os.path.getmtime(
                        os.path.join(work_dir, name)))
                except OSError:
                    pass
    return newest


def run_segment(cmd, work_dir: str, stall_timeout: float) -> int:
    """Run one segment with a progress watchdog: if the JSONL log stops
    advancing for ``stall_timeout`` seconds the child is killed (rc 99).
    Observed failure mode (r5): the tunnel client occasionally never
    receives a response — every thread futex-parks and the run wedges
    silently. The timeout must comfortably exceed a cold compile +
    first-eval window (no log writes then)."""
    import time
    proc = subprocess.Popen(cmd)
    started = time.time()
    last_mtime = _newest_log_mtime(work_dir)
    last_change = started
    poll_s = min(30.0, max(stall_timeout / 4, 0.25))
    while True:
        try:
            return proc.wait(timeout=poll_s)
        except subprocess.TimeoutExpired:
            pass
        m = _newest_log_mtime(work_dir)
        if m > last_mtime:
            last_mtime, last_change = m, time.time()
        elif time.time() - last_change > stall_timeout:
            if proc.poll() is not None:     # exited during the check
                return proc.poll()
            print(f"[chunked] no log progress for {stall_timeout:.0f}s — "
                  "killing wedged segment", flush=True)
            proc.kill()
            proc.wait()
            return 99


def main():
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--segment-iters", type=int, default=2000)
    ap.add_argument("--max-iters", type=int, required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stall-timeout", type=float, default=1500.0)
    ap.add_argument("--max-stuck-retries", type=int, default=4)
    args, passthrough = ap.parse_known_args()

    train_py = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "train.py")
    stuck = 0
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
        rc = run_segment(cmd, args.work_dir, args.stall_timeout)
        if rc != 0:
            print(f"[chunked] segment exited rc={rc}", flush=True)
            ckpt2, start2 = latest_checkpoint(args.work_dir)
            if start2 > start:
                stuck = 0          # made checkpoint progress — keep going
                continue
            stuck += 1
            # no checkpoint progress: transient infra wedges deserve a few
            # retries (the segment replays from the last checkpoint); a
            # genuine config error must not loop forever
            if stuck > args.max_stuck_retries:
                return rc
            # give the remote TPU runtime time to reap the killed
            # session before reconnecting — an immediate retry was
            # observed to wedge again on the orphaned chip (r5)
            import time
            print(f"[chunked] backing off 120 s before retry {stuck}",
                  flush=True)
            time.sleep(120)


if __name__ == "__main__":
    sys.exit(main())
