"""Cityscapes preparation: TrainId label PNGs + Rare-Class-Sampling stats.

Replaces reference tools/convert_datasets/cityscapes.py:14-108. Outputs:
  * <gt>/..._labelTrainIds.png (from cityscapesscripts polygons when the
    package is available, else remapped from *_labelIds.png)
  * sample_class_stats.json          [{class: n, ..., 'file': path}, ...]
  * sample_class_stats_dict.json     {path: {class: n}}
  * samples_with_class.json          {class: [[path, n], ...]}
  * train/val/test .txt split listings
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp

import numpy as np
from PIL import Image

# labelId -> trainId (Cityscapes 34 -> 19 classes)
LABELID_TO_TRAINID = np.full(256, 255, np.uint8)
for lid, tid in {7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7,
                 21: 8, 22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14,
                 28: 15, 31: 16, 32: 17, 33: 18}.items():
    LABELID_TO_TRAINID[lid] = tid


def class_stats(label_path: str, num_classes: int = 19):
    label = np.asarray(Image.open(label_path))
    stats = {}
    for c in range(num_classes):
        n = int(np.sum(label == c))
        if n > 0:
            stats[int(c)] = n
    stats["file"] = label_path
    return stats


def save_class_stats(out_dir: str, entries: list):
    entries = [e for e in entries if e is not None]
    with open(osp.join(out_dir, "sample_class_stats.json"), "w") as f:
        json.dump(entries, f, indent=2)
    d = {}
    for stats in entries:
        stats = dict(stats)
        fname = stats.pop("file")
        d[fname] = stats
    with open(osp.join(out_dir, "sample_class_stats_dict.json"), "w") as f:
        json.dump(d, f, indent=2)
    swc = {}
    for fname, stats in d.items():
        for c, n in stats.items():
            swc.setdefault(c, []).append((fname, n))
    with open(osp.join(out_dir, "samples_with_class.json"), "w") as f:
        json.dump(swc, f, indent=2)


def convert_one(src: str) -> str:
    """polygons json or labelIds png -> labelTrainIds png path."""
    if src.endswith("_polygons.json"):
        dst = src.replace("_polygons.json", "_labelTrainIds.png")
        from cityscapesscripts.preparation.json2labelImg import json2labelImg
        json2labelImg(src, dst, "trainIds")
        return dst
    assert src.endswith("_labelIds.png")
    dst = src.replace("_labelIds.png", "_labelTrainIds.png")
    lbl = np.asarray(Image.open(src))
    Image.fromarray(LABELID_TO_TRAINID[lbl]).save(dst)
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cityscapes_path")
    ap.add_argument("--gt-dir", default="gtFine")
    ap.add_argument("-o", "--out-dir", default=None)
    ap.add_argument("--stats-only", action="store_true",
                    help="only (re)compute RCS stats from existing TrainId PNGs")
    args = ap.parse_args()
    out_dir = args.out_dir or args.cityscapes_path
    os.makedirs(out_dir, exist_ok=True)
    gt_dir = osp.join(args.cityscapes_path, args.gt_dir)

    entries = []
    if args.stats_only:
        files = sorted(glob.glob(
            osp.join(gt_dir, "train", "**", "*_labelTrainIds.png"),
            recursive=True))
        for f in files:
            entries.append(class_stats(f))
    else:
        try:
            import cityscapesscripts  # noqa: F401
            pattern = "*_polygons.json"
        except ImportError:
            pattern = "*_labelIds.png"
        for split in ("train", "val", "test"):
            files = sorted(glob.glob(osp.join(gt_dir, split, "**", pattern),
                                     recursive=True))
            for f in files:
                dst = convert_one(f)
                if split == "train":
                    entries.append(class_stats(dst))
    save_class_stats(out_dir, entries)

    for split in ("train", "val", "test"):
        files = sorted(glob.glob(
            osp.join(gt_dir, split, "**", "*_labelTrainIds.png"),
            recursive=True))
        names = [osp.basename(f).replace("_gtFine_labelTrainIds.png", "")
                 for f in files]
        with open(osp.join(out_dir, f"{split}.txt"), "w") as f:
            f.writelines(n + "\n" for n in names)


if __name__ == "__main__":
    main()
