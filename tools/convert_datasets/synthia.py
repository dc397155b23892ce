"""SYNTHIA_RAND_CITYSCAPES preparation: 16-class TrainId PNGs + RCS stats.

Replaces reference tools/convert_datasets/synthia.py:11-118. SYNTHIA labels
are 16-bit multi-channel PNGs (class id in the last channel, which PIL does
not decode — cv2 IMREAD_UNCHANGED does); the remap covers the 16 classes
SYNTHIA shares with Cityscapes (9/14/16 = terrain/truck/train absent).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from cityscapes import class_stats, save_class_stats  # noqa: E402

# SYNTHIA id -> Cityscapes trainId (reference synthia.py:16-36)
SYNTHIA_TO_TRAINID = np.full(256, 255, np.uint8)
for sid, tid in {3: 0, 4: 1, 2: 2, 21: 3, 5: 4, 7: 5, 15: 6, 9: 7, 6: 8,
                 16: 9, 1: 10, 10: 11, 17: 12, 8: 13, 18: 14, 19: 15,
                 20: 16, 12: 17, 11: 18}.items():
    SYNTHIA_TO_TRAINID[sid] = tid


def read_label(path: str) -> np.ndarray:
    try:
        import cv2
        return cv2.imread(path, cv2.IMREAD_UNCHANGED)[:, :, -1]
    except ImportError:  # pragma: no cover - cv2 is baked into this image
        arr = np.asarray(Image.open(path))
        return arr[..., -1] if arr.ndim == 3 else arr


def convert_one(src: str) -> str:
    dst = src.replace(".png", "_labelTrainIds.png")
    assert src != dst
    lbl = np.clip(read_label(src), 0, 255).astype(np.uint8)
    Image.fromarray(SYNTHIA_TO_TRAINID[lbl], mode="L").save(dst)
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("synthia_path")
    ap.add_argument("--gt-dir", default="GT/LABELS")
    ap.add_argument("-o", "--out-dir", default=None)
    args = ap.parse_args()
    out_dir = args.out_dir or args.synthia_path
    os.makedirs(out_dir, exist_ok=True)

    files = sorted(glob.glob(osp.join(args.synthia_path, args.gt_dir, "**",
                                      "*.png"), recursive=True))
    files = [f for f in files if not f.endswith("_labelTrainIds.png")]
    entries = []
    for f in files:
        entries.append(class_stats(convert_one(f)))
    save_class_stats(out_dir, entries)
    print(json.dumps({"converted": len(entries), "out_dir": out_dir}))


if __name__ == "__main__":
    main()
