"""Summarize a jax.profiler trace: top device ops by total duration.

Usage: python tools/analyze_trace.py /tmp/trace_dir [--top 30]

Reads the TensorBoard-format trace artifacts that jax.profiler.trace
writes under <dir>/plugins/profile/<run>/: prefers the Chrome
``*.trace.json.gz`` event dump; falls back to the ``*.xplane.pb`` proto
(decoded with TensorFlow's profiler protos when available).

The reference has no profiling tooling at all (SURVEY §5.1); this is the
companion to tools/profile_step.py --trace used for the r2/r3 gather hunts
(docs/PERF.md).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_artifacts(root: str):
    runs = sorted(glob.glob(os.path.join(root, "plugins", "profile", "*")))
    if not runs:
        sys.exit(f"no profile runs under {root}")
    run = runs[-1]
    return (sorted(glob.glob(os.path.join(run, "*.trace.json.gz"))),
            sorted(glob.glob(os.path.join(run, "*.xplane.pb"))))


def load_chrome_events(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def device_events_from_chrome(events):
    """Yield (name, dur_us) for TPU/device lane complete events."""
    # pid -> process name, to keep device lanes and drop host threads
    proc = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in proc.items()
                if re.search(r"TPU|device|/device:", n, re.I)}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            yield e["name"], float(e["dur"])


def device_events_from_xplane(path: str):
    from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if not re.search(r"TPU|Device", plane.name, re.I):
            continue
        if re.search(r"host", plane.name, re.I):
            continue
        names = {k: v for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                md = names.get(ev.metadata_id)
                if md is None:
                    continue
                yield md.name, ev.duration_ps / 1e6  # ps -> us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--merge-counters", action="store_true", default=True,
                    help="strip trailing .N instance suffixes when grouping")
    args = ap.parse_args()

    chrome, xplanes = find_artifacts(args.trace_dir)
    events = []
    if chrome:
        for p in chrome:
            events.extend(device_events_from_chrome(load_chrome_events(p)))
    elif xplanes:
        for p in xplanes:
            events.extend(device_events_from_xplane(p))
    if not events:
        sys.exit("no device events found in trace")

    total = collections.Counter()
    count = collections.Counter()
    for name, dur in events:
        key = re.sub(r"\.\d+$", "", name)
        total[key] += dur
        count[key] += 1
    grand = sum(total.values())
    print(f"{'total_ms':>9} {'n':>5} {'avg_us':>9} {'%':>6}  op")
    for name, dur in total.most_common(args.top):
        print(f"{dur / 1e3:9.2f} {count[name]:5d} {dur / count[name]:9.1f} "
              f"{100 * dur / grand:6.2f}  {name[:110]}")
    print(f"\ndevice total: {grand / 1e3:.1f} ms across {len(total)} distinct ops")


if __name__ == "__main__":
    main()
