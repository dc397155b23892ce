"""Build DSEC-Night index files.

Replaces reference create_dsec_dataset_txt.py:10-146:
  * images_to_events_index.txt — for each frame timestamp, the index of the
    last event at/before it (coarse bucket from the per-millisecond
    ``ms_to_idx`` table, then a binary search within the 2ms window).
  * night_dataset_warp.txt / night_test_dataset_warp.txt — one
    "<image_path> <finish_index>" row per usable warped frame; the train txt
    excludes each sequence's labeled range, the test txt keeps only labeled
    frames.
"""
from __future__ import annotations

import argparse
import math
import os
import os.path as osp

import numpy as np

try:
    import hdf5plugin  # noqa: F401
except ImportError:
    pass
import h5py

# labeled frame ranges per sequence (train frames are the complement)
LABELS_RANGE = {"09_a": (0, 810 - 13), "09_b": (0, 162 - 13),
                "09_c": (0, 594 - 13), "09_d": (0, 756 - 13),
                "09_e": (0, 378 - 13)}


def build_images_to_events_index(timestamps_path, events_h5_path, out_path):
    with h5py.File(events_h5_path, "r") as h5:
        events_t = h5["events/t"]
        t_offset = int(h5["t_offset"][()]) if "t_offset" in h5 else 0
        ms_to_idx = np.asarray(h5["ms_to_idx"], dtype=np.int64) \
            if "ms_to_idx" in h5 else None
        timestamps = np.loadtxt(timestamps_path, dtype=np.int64)
        n_events = events_t.shape[0]
        out = []
        for ts in np.atleast_1d(timestamps):
            us = ts - t_offset
            if us <= 0 or us > events_t[-1]:
                out.append(-1)
                continue
            if ms_to_idx is not None:
                ms = max(math.floor(us / 1000) - 1, 0)
                left = int(ms_to_idx[ms])
                right = int(ms_to_idx[min(ms + 2, len(ms_to_idx) - 1)])
                right = min(right, n_events - 1)
            else:
                left, right = 0, n_events - 1
            window = np.asarray(events_t[left: right + 1], dtype=np.int64)
            idx = int(np.searchsorted(window, us, "right"))
            out.append(left + idx - 1)
    np.savetxt(out_path, np.asarray(out, np.int64), fmt="%d")
    return out


def build_dataset_txt(root, out_path, *, image_change_num=2, min_events=0,
                      labels_txt=False, labels_range=None,
                      warp_images=True):
    rows = []
    for seq in sorted(os.listdir(root)):
        seq_dir = osp.join(root, seq)
        idx_path = osp.join(seq_dir, "images", "images_to_events_index.txt")
        if not osp.exists(idx_path):
            continue
        city = seq.split("zurich_city_")[-1]
        index_map = np.loadtxt(idx_path, dtype=np.int64)
        labeled = set()
        if labels_txt:
            lbl_dir = osp.join(seq_dir, "labels")
            if not osp.isdir(lbl_dir):
                continue
            for name in os.listdir(lbl_dir):
                labeled.add(int(name.split("_")[4]))
        img_dir = osp.join(seq_dir, "images", "left", "rectified")
        for i in range(len(index_map)):
            name = f"{i:06d}.png"
            img_path = osp.join(img_dir, name)
            if warp_images and not osp.exists(
                    img_path.replace("images/left/rectified", "warp_images")):
                continue
            if index_map[i] <= min_events or i < image_change_num:
                continue
            if labels_txt and i not in labeled:
                continue
            if labels_range and city in labels_range:
                lo, hi = labels_range[city]
                if lo <= i <= hi:
                    continue
            rows.append(f"{img_path} {index_map[i]}")
    with open(out_path, "w") as f:
        f.write("\n".join(rows) + ("\n" if rows else ""))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root_dir", required=True)
    ap.add_argument("--out_dir", default=".")
    args = ap.parse_args()
    for seq in sorted(os.listdir(args.root_dir)):
        seq_dir = osp.join(args.root_dir, seq)
        ts = osp.join(seq_dir, "images", "timestamps.txt")
        ev = osp.join(seq_dir, "events", "left", "events.h5")
        if osp.exists(ts) and osp.exists(ev):
            print(f"indexing {seq}...")
            build_images_to_events_index(
                ts, ev, osp.join(seq_dir, "images",
                                 "images_to_events_index.txt"))
    build_dataset_txt(args.root_dir,
                      osp.join(args.out_dir, "night_dataset_warp.txt"),
                      labels_range=LABELS_RANGE)
    build_dataset_txt(args.root_dir,
                      osp.join(args.out_dir, "night_test_dataset_warp.txt"),
                      labels_txt=True)


if __name__ == "__main__":
    main()
