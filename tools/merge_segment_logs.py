"""Merge per-segment JSONL train logs into one canonical stream.

`tools/train_chunked.py` produces one `<timestamp>.log.json` per segment
process, and crashed/replayed segments leave overlapping iter ranges
(dead branches). The canonical history is: process files in chronological
order (their timestamped names sort), and for records carrying an `iter`
let LATER files override earlier ones — the last attempt at an iter is
the one whose state actually carried forward through the checkpoint
chain. Non-iter records (the env header) are taken from the first file.

    python tools/merge_segment_logs.py work_dirs/run out.log.json
"""
from __future__ import annotations

import glob
import json
import os
import sys


def merge(work_dir: str):
    files = sorted(glob.glob(os.path.join(work_dir, "*.log.json")))
    header = None
    by_iter = {}         # (iter, kind) -> record; kind: 'train' | 'eval'
    for f in files:
        for line in open(f):
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if "iter" not in d:
                if header is None:
                    header = d
                continue
            kind = "eval" if "eval" in d else "train"
            by_iter[(d["iter"], kind)] = d
    out = [header] if header else []
    # train record for iter N precedes the eval at iter N
    out += [by_iter[k] for k in sorted(by_iter,
                                       key=lambda k: (k[0], k[1] == "eval"))]
    return out


def main():
    work_dir, out_path = sys.argv[1], sys.argv[2]
    records = merge(work_dir)
    with open(out_path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    evals = [r for r in records if "eval" in r]
    print(json.dumps({"records": len(records), "evals": [
        (r["iter"], round(r["eval"]["mIoU"] * 100, 2)) for r in evals]}))


if __name__ == "__main__":
    main()
