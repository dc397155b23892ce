"""Fabricate a miniature Cityscapes + DSEC corpus on disk.

Produces the exact on-disk layout the real-data CLI path consumes
(reference data conventions, SURVEY §2.2/2.3): Cityscapes frames + IC1
temporal-diff PNGs + gtFine labelTrainIds + the two RCS json files, and a
DSEC sequence (gzip-chunked events.h5, rectify map, warp images, event
index txt, labels for the test split). Lets a CLI smoke run exercise the
full real-files pipeline without any dataset download:

  python tools/make_fake_corpus.py --root /tmp/corpus
  python tools/train.py --config cs2dsec --backbone mit_b0 \\
      --set model.head.in_channels=32,64,160,256 \\
      --source-root /tmp/corpus/cityscapes \\
      --target-txt /tmp/corpus/dsec/night_dataset_warp.txt \\
      --val-txt /tmp/corpus/dsec/night_test_dataset_warp.txt \\
      --rcs-json-dir /tmp/corpus/cityscapes --max-iters 3
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Class-keyed palette: pixel appearance is a (noisy) function of the label,
# so the corpus is LEARNABLE — a source-only model picks up the mapping on
# the bright "day" domain and UDA self-training must close the gap to the
# dark "night" rendering of the same palette (the convergence-demo circuit;
# VERDICT r2 item 3). Set --unlearnable to restore pure-noise images.
_PALETTE = np.stack([
    np.array([(50 + 11 * c) % 256, (210 - 9 * c) % 256, (37 * c + 20) % 256],
             np.float64) for c in range(19)])


def _day_image(g, lbl):
    """Bright domain: palette color + noise."""
    img = _PALETTE[lbl] + g.normal(0.0, 18.0, lbl.shape + (3,))
    return np.clip(img, 0, 255).astype(np.uint8)


def _night_image(g, lbl):
    """Dark domain: dimmed palette + blue cast + noise (the cs->dsec /
    cs->dz day->night shift analogue)."""
    img = 0.35 * _PALETTE[lbl] + np.array([0.0, 0.0, 40.0])
    img = img + g.normal(0.0, 12.0, lbl.shape + (3,))
    return np.clip(img, 0, 255).astype(np.uint8)


def fabricate_cityscapes(root: str, n_images: int = 6,
                         size=(512, 256), learnable: bool = True) -> str:
    """leftImg8bit/train + leftImg8bit_IC1 + gtFine + RCS jsons."""
    g = np.random.default_rng(0)
    img_dir = os.path.join(root, "leftImg8bit", "train", "faketown")
    ic_dir = os.path.join(root, "leftImg8bit_IC1", "train", "faketown")
    gt_dir = os.path.join(root, "gtFine", "train", "faketown")
    for d in (img_dir, ic_dir, gt_dir):
        os.makedirs(d, exist_ok=True)
    w, h = size
    stats_dict, with_class = {}, {}
    for i in range(n_images):
        name = f"faketown_{i:06d}_000019_leftImg8bit.png"
        path = os.path.join(img_dir, name)
        # blocky labels so RCS crops can find whole classes
        lbl = np.repeat(np.repeat(
            g.integers(0, 19, (h // 64, w // 64)).astype(np.uint8),
            64, axis=0), 64, axis=1)[:h, :w]
        img = (_day_image(g, lbl) if learnable
               else g.integers(0, 255, (h, w, 3), np.uint8).astype(np.uint8))
        Image.fromarray(img).save(path)
        ic_name = name.replace("leftImg8bit", "leftImg8bit_IC1")[:-8] + ".png"
        Image.fromarray(g.integers(0, 255, (h, w), np.uint8)
                        .astype(np.uint8)).save(os.path.join(ic_dir, ic_name))
        lbl_name = name.replace("leftImg8bit", "gtFine")[:-4] \
            + "_labelTrainIds.png"
        Image.fromarray(lbl).save(os.path.join(gt_dir, lbl_name))
        classes, counts = np.unique(lbl, return_counts=True)
        stats_dict[path] = {str(int(c)): int(n)
                            for c, n in zip(classes, counts)}
        for c, n in zip(classes, counts):
            with_class.setdefault(str(int(c)), []).append([path, int(n)])
    with open(os.path.join(root, "sample_class_stats_dict.json"), "w") as f:
        json.dump(stats_dict, f)
    with open(os.path.join(root, "samples_with_class.json"), "w") as f:
        json.dump(with_class, f)
    return root


def fabricate_dsec_with_labels(root: str, n_frames: int = 8,
                               events_per_window: int = 20000,
                               learnable: bool = True):
    """bench_ingest's DSEC fabricator + a labels/ dir + test split txt.
    With ``learnable``, the warp/rectified frames are re-rendered as the
    night-domain view of per-frame blocky labels (palette above)."""
    from tools.bench_ingest import fabricate_dsec
    g = np.random.default_rng(1)
    txt = fabricate_dsec(root, n_frames, events_per_window)
    seq_dir = os.path.join(root, "zurich_city_09_x")
    lbl_dir = os.path.join(seq_dir, "labels")
    os.makedirs(lbl_dir, exist_ok=True)
    for i in range(n_frames):
        lbl = np.repeat(np.repeat(
            g.integers(0, 19, (480 // 32, 640 // 32)).astype(np.uint8),
            32, axis=0), 32, axis=1)
        if learnable:
            img = Image.fromarray(_night_image(g, lbl))
            img.save(os.path.join(seq_dir, "warp_images", f"{i:06d}.png"))
            img.save(os.path.join(seq_dir, "images", "left", "rectified",
                                  f"{i:06d}.png"))
        if i >= 1:
            Image.fromarray(lbl).save(os.path.join(
                lbl_dir,
                f"zurich_city_09_x_{i:06d}_grey_gtFine_labelTrainIds.png"))
    rows = open(txt).read().splitlines()
    test_txt = os.path.join(root, "night_test_dataset_warp.txt")
    # eval split scales with the corpus: a fixed 2-frame split made eval
    # mIoU oscillate +-1 point at 512^2 (r4 conv512 diagnosis) — mIoU over
    # two 440x640 frames is dominated by which rare classes happen to
    # appear in them
    n_test = max(2, len(rows) // 4)
    with open(test_txt, "w") as f:
        f.write("\n".join(rows[-n_test:]))
    return txt, test_txt


def fabricate_dark_zurich(root: str, n_images: int = 4,
                          size=(480, 270), learnable: bool = True) -> str:
    """rgb_anon/{train,val}/night + gt/val labelTrainIds (reference
    dark_zurich_ic.py layout)."""
    g = np.random.default_rng(2)
    w, h = size
    for split in ("train", "val", "test"):
        img_dir = os.path.join(root, "rgb_anon", split, "night", "seq01")
        os.makedirs(img_dir, exist_ok=True)
        for i in range(n_images):
            name = f"seq01_frame_{i:06d}_rgb_anon.png"
            lbl = np.repeat(np.repeat(
                g.integers(0, 19, (h // 32 + 1, w // 32 + 1))
                .astype(np.uint8), 32, axis=0), 32, axis=1)[:h, :w]
            img = (_night_image(g, lbl) if learnable
                   else g.integers(0, 255, (h, w, 3), np.uint8)
                   .astype(np.uint8))
            Image.fromarray(img).save(os.path.join(img_dir, name))
            if split == "val":
                gt_dir = os.path.join(root, "gt", "val", "night", "seq01")
                os.makedirs(gt_dir, exist_ok=True)
                # label path rule: rgb_anon->gt twice (dark_zurich.py
                # _label_path): X_rgb_anon.png -> X_gt_labelTrainIds.png
                Image.fromarray(lbl).save(os.path.join(
                    gt_dir,
                    name.replace("_rgb_anon.png", "_gt_labelTrainIds.png")))
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--images", type=int, default=6)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--events-per-window", type=int, default=20000)
    ap.add_argument("--unlearnable", action="store_true",
                    help="pure-noise images (pre-r3 behavior) instead of "
                         "the learnable class-keyed palette rendering")
    args = ap.parse_args()
    learnable = not args.unlearnable
    cs = fabricate_cityscapes(os.path.join(args.root, "cityscapes"),
                              args.images, learnable=learnable)
    train_txt, test_txt = fabricate_dsec_with_labels(
        os.path.join(args.root, "dsec"), args.frames,
        args.events_per_window, learnable=learnable)
    dz = fabricate_dark_zurich(os.path.join(args.root, "dark_zurich"),
                               learnable=learnable)
    print(json.dumps({"cityscapes": cs, "target_txt": train_txt,
                      "val_txt": test_txt, "dark_zurich": dz}))


if __name__ == "__main__":
    main()
