"""GTA5 preparation: TrainId label PNGs + Rare-Class-Sampling stats.

Replaces reference tools/convert_datasets/gta.py:10-116: GTA labels already
use Cityscapes labelIds, so the same 34->19 remap applies; writes
*_labelTrainIds.png next to each label plus the three RCS json files.
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
from cityscapes import LABELID_TO_TRAINID, class_stats, save_class_stats  # noqa: E402


def convert_one(src: str) -> str:
    dst = src.replace(".png", "_labelTrainIds.png")
    assert src != dst
    lbl = np.asarray(Image.open(src))
    Image.fromarray(LABELID_TO_TRAINID[lbl], mode="L").save(dst)
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gta_path")
    ap.add_argument("--gt-dir", default="labels")
    ap.add_argument("-o", "--out-dir", default=None)
    args = ap.parse_args()
    out_dir = args.out_dir or args.gta_path
    os.makedirs(out_dir, exist_ok=True)

    files = sorted(glob.glob(osp.join(args.gta_path, args.gt_dir, "**",
                                      "*.png"), recursive=True))
    files = [f for f in files if not f.endswith("_labelTrainIds.png")]
    entries = []
    for f in files:
        entries.append(class_stats(convert_one(f)))
    save_class_stats(out_dir, entries)
    print(json.dumps({"converted": len(entries), "out_dir": out_dir}))


if __name__ == "__main__":
    main()
