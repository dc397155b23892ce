"""Legacy source/target datasets for the DAFormer experiment grid.

Covers the reference's non-CMDA datasets (mmseg/datasets/):
  * ``LegacySegDataset`` — generic (image, label) loader with the shared
    resize/crop/flip geometry (the pipeline-driven CustomDataset's common
    train transform chain, custom.py:23+ / pipelines/transforms.py).
  * ``GTADataset``       — GTA5 (gta.py): images/ + labels/*_labelTrainIds.png.
  * ``SynthiaDataset``   — SYNTHIA_RAND_CITYSCAPES (synthia.py): RGB/ +
    GT/LABELS/*_labelTrainIds.png (16 valid classes).
  * ``ACDCDataset``      — ACDC night split (acdc.py): rgb_anon/ + gt/.
  * ``CityscapesDataset``— val/test loader + ``format_results`` writing
    evaluation-server labelId PNGs (reference cityscapes.py:97-160).

All loaders expose ``load(idx, rng=None)`` with per-worker RNG like the CMDA
datasets, and emit canonical keys: image (HWC f32 normalized), label (HW i32).
"""
from __future__ import annotations

import glob
import os
import random

import numpy as np
from PIL import Image

from .host_isr import normalize_image

# trainId -> Cityscapes labelId (inverse of the 34->19 remap; for server
# submission PNGs, reference cityscapes.py:97 results2img)
TRAINID_TO_LABELID = np.full(256, 0, np.uint8)
for lid, tid in {7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7,
                 21: 8, 22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14,
                 28: 15, 31: 16, 32: 17, 33: 18}.items():
    TRAINID_TO_LABELID[tid] = lid


class LegacySegDataset:
    """(image, label) pairs with resize -> random crop -> random flip."""

    def __init__(self, image_files, label_files, *,
                 image_resize_size=(1024, 512), image_crop_size=(512, 512),
                 test_mode: bool = False):
        assert len(image_files) == len(label_files), \
            (len(image_files), len(label_files))
        self.files = list(image_files)
        self.label_files = list(label_files)
        self.resize = image_resize_size
        self.crop = image_crop_size
        self.test_mode = test_mode

    def __len__(self):
        return len(self.files)

    def load(self, idx: int, crop_xy=None, flip=None,
             rng: random.Random | None = None):
        r = rng if rng is not None else random
        img = Image.open(self.files[idx]).convert("RGB").resize(
            self.resize, resample=Image.BILINEAR)
        lbl = Image.open(self.label_files[idx]).resize(
            self.resize, resample=Image.NEAREST)
        if not self.test_mode:
            if crop_xy is None:
                crop_xy = (r.randint(0, self.resize[0] - self.crop[0]),
                           r.randint(0, self.resize[1] - self.crop[1]))
            if flip is None:
                flip = r.random() < 0.5
            x, y = crop_xy
            box = (x, y, x + self.crop[0], y + self.crop[1])
            img, lbl = img.crop(box), lbl.crop(box)
            if flip:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
                lbl = lbl.transpose(Image.FLIP_LEFT_RIGHT)
        return {"image": normalize_image(img),
                "label": np.asarray(lbl).astype(np.int32)}

    def __getitem__(self, idx):
        return self.load(idx)


def _paired(image_glob: str, to_label) -> tuple[list, list]:
    images = sorted(glob.glob(image_glob, recursive=True))
    pairs = [(i, to_label(i)) for i in images]
    pairs = [(i, l) for i, l in pairs if os.path.exists(l)]
    return [p[0] for p in pairs], [p[1] for p in pairs]


class GTADataset(LegacySegDataset):
    def __init__(self, root: str, **kw):
        imgs, lbls = _paired(
            os.path.join(root, "images", "**", "*.png"),
            lambda p: p.replace(os.sep + "images" + os.sep,
                                os.sep + "labels" + os.sep
                                ).replace(".png", "_labelTrainIds.png"))
        super().__init__(imgs, lbls, **kw)


class SynthiaDataset(LegacySegDataset):
    VALID_CLASSES = 16  # terrain/truck/train absent (synthia.py remap)

    def __init__(self, root: str, **kw):
        imgs, lbls = _paired(
            os.path.join(root, "RGB", "**", "*.png"),
            lambda p: p.replace(os.sep + "RGB" + os.sep,
                                os.sep + "GT" + os.sep + "LABELS" + os.sep
                                ).replace(".png", "_labelTrainIds.png"))
        super().__init__(imgs, lbls, **kw)


class ACDCDataset(LegacySegDataset):
    """ACDC (night condition by default): rgb_anon/<cond>/<split>/..."""

    def __init__(self, root: str, *, split: str = "train",
                 condition: str = "night", **kw):
        imgs, lbls = _paired(
            os.path.join(root, "rgb_anon", condition, split, "**",
                         "*_rgb_anon.png"),
            lambda p: p.replace(os.sep + "rgb_anon" + os.sep,
                                os.sep + "gt" + os.sep
                                ).replace("_rgb_anon.png",
                                          "_gt_labelTrainIds.png"))
        kw.setdefault("test_mode", split != "train")
        super().__init__(imgs, lbls, **kw)


class CityscapesDataset(LegacySegDataset):
    """Cityscapes val/test loader + evaluation-server export."""

    def __init__(self, root: str, *, split: str = "val", **kw):
        imgs, lbls = _paired(
            os.path.join(root, "leftImg8bit", split, "**",
                         "*_leftImg8bit.png"),
            lambda p: p.replace(os.sep + "leftImg8bit" + os.sep,
                                os.sep + "gtFine" + os.sep
                                ).replace("_leftImg8bit.png",
                                          "_gtFine_labelTrainIds.png"))
        if not lbls:  # test split ships no labels
            imgs = sorted(glob.glob(os.path.join(
                root, "leftImg8bit", split, "**", "*_leftImg8bit.png"),
                recursive=True))
            lbls = imgs  # placeholder, never read in test_mode w/o labels
        kw.setdefault("test_mode", True)
        super().__init__(imgs, lbls, **kw)

    def format_results(self, results, out_dir: str,
                       to_label_id: bool = True) -> list:
        """Write one PNG per prediction for the evaluation server
        (reference cityscapes.py:97-160 results2img: trainId -> labelId,
        named <city>_<seq>_<frame>_leftImg8bit.png -> *.png)."""
        os.makedirs(out_dir, exist_ok=True)
        written = []
        for pred, img_path in zip(results, self.files):
            arr = np.asarray(pred).astype(np.uint8)
            if to_label_id:
                arr = TRAINID_TO_LABELID[arr]
            name = os.path.basename(img_path).replace(
                "_leftImg8bit.png", ".png")
            path = os.path.join(out_dir, name)
            Image.fromarray(arr, mode="L").save(path)
            written.append(path)
        return written


class RepeatDataset:
    """Virtually repeat a dataset N times (reference dataset_wrappers.py)."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def __len__(self):
        return len(self.dataset) * self.times

    def load(self, idx, rng=None, **kw):
        return self.dataset.load(idx % len(self.dataset), rng=rng, **kw)

    def __getitem__(self, idx):
        return self.load(idx)


class ConcatDataset:
    """Concatenate datasets with compatible sample dicts
    (reference dataset_wrappers.py ConcatDataset)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = []
        total = 0
        for d in self.datasets:
            total += len(d)
            self._offsets.append(total)

    def __len__(self):
        return self._offsets[-1] if self._offsets else 0

    def load(self, idx, rng=None, **kw):
        prev = 0
        for d, off in zip(self.datasets, self._offsets):
            if idx < off:
                return d.load(idx - prev, rng=rng, **kw)
            prev = off
        raise IndexError(idx)

    def __getitem__(self, idx):
        return self.load(idx)
