"""Plot metrics from .log.json training logs.

Equivalent of reference tools/analyze_logs.py (mmseg's log analyzer) for our
JSON-lines format: each line is either a train record
({"loss": ..., "iter": N, "time": ..., ...}) or an eval record
({"iter": N, "eval": {"mIoU": ..., ...}}).

Usage:
  python tools/analyze_logs.py plot_curve <log1.log.json> [log2 ...] \
      --keys loss mIoU --out curves.png
  python tools/analyze_logs.py cal_train_time <log.log.json>
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_log(path: str) -> list[dict]:
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def series(records: list[dict], key: str):
    """-> (iters, values) for a train metric or eval metric (eval.<key>)."""
    its, vals = [], []
    for r in records:
        if key in r and "iter" in r:
            its.append(r["iter"]), vals.append(r[key])
        elif "eval" in r and key in r["eval"]:
            its.append(r["iter"]), vals.append(r["eval"][key])
    return its, vals


def plot_curve(paths, keys, out=None, title=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for path in paths:
        records = load_log(path)
        base = os.path.basename(path)
        for key in keys:
            its, vals = series(records, key)
            if not its:
                print(f"[warn] {key} not found in {base}")
                continue
            marker = "o" if key in ("mIoU", "mAcc", "aAcc") else None
            ax.plot(its, vals, label=f"{base}:{key}", marker=marker,
                    linewidth=1.0)
    ax.set_xlabel("iter")
    ax.legend(fontsize=8)
    if title:
        ax.set_title(title)
    out = out or "log_curves.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(json.dumps({"saved": out}))
    return out


def cal_train_time(path: str) -> dict:
    records = load_log(path)
    times = [r["time"] for r in records if "time" in r]
    data_times = [r["data_time"] for r in records if "data_time" in r]
    if not times:
        print(json.dumps({"error": "no time records"}))
        return {}
    # the first record includes compile; report both
    stats = {
        "n_records": len(times),
        "mean_iter_time_s": sum(times[1:]) / max(len(times) - 1, 1),
        "first_iter_time_s": times[0],
        "mean_data_time_s": (sum(data_times) / len(data_times)
                             if data_times else None),
        "slowest_iter_s": max(times[1:]) if len(times) > 1 else times[0],
        "fastest_iter_s": min(times[1:]) if len(times) > 1 else times[0],
    }
    print(json.dumps(stats, indent=2))
    return stats


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("plot_curve")
    p.add_argument("json_logs", nargs="+")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--out", default=None)
    p.add_argument("--title", default=None)
    p = sub.add_parser("cal_train_time")
    p.add_argument("json_log")
    args = ap.parse_args()
    if args.cmd == "plot_curve":
        plot_curve(args.json_logs, args.keys, args.out, args.title)
    else:
        cal_train_time(args.json_log)


if __name__ == "__main__":
    main()
