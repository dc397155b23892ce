"""DSEC Rare-Class-Sampling stats from the 19classes label PNGs.

Replaces reference tools/convert_datasets/dsec.py:14-101. Scans
<root>/<sequence>/19classes/*.png and writes the same three RCS json files
as the Cityscapes converter.
"""
from __future__ import annotations

import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from tools.convert_datasets.cityscapes import class_stats, save_class_stats  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dsec_path")
    ap.add_argument("-o", "--out-dir", default=None)
    args = ap.parse_args()
    out_dir = args.out_dir or args.dsec_path
    files = sorted(glob.glob(osp.join(args.dsec_path, "*", "19classes",
                                      "*.png")))
    entries = [class_stats(f) for f in files]
    save_class_stats(out_dir, entries)
    print(f"{len(entries)} label files -> RCS stats in {out_dir}")


if __name__ == "__main__":
    main()
