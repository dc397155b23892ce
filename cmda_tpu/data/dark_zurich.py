"""DarkZurich — unlabeled nighttime target (image + raw ISR); labeled val.

Behavioral contract (reference mmseg/datasets/dark_zurich_ic.py:22-467):
  * files: rgb_anon/{train|val|test}/night/<seq>/*.png; labels
    gt/val/night/... *_gt_labelTrainIds.png.
  * train geometry: resize (960, 540) PIL-bilinear, random 512x512 crop +
    flip; night_isr computed on the *resized full frame* then cropped
    (dark_zurich_ic.py:244-264 'night_isr' branch) with
    direct[x % 2][y % 2] for shift_type='random'.
  * val/test: full 960x540 frames, no crop; labels (1080x1920) are
    nearest-resized to 960x540 for evaluation (:432-440).
  * the d2n variant also pairs a random day image + its CycleGAN-transferred
    ISR ('day_image'/'day_t_isr', the [960:1920) crop of a side-by-side PNG).

Outputs canonical keys: image, isr (HWC f32), label (HW i32),
day_image/day_isr when requested.
"""
from __future__ import annotations

import os
import random

import numpy as np
from PIL import Image

from .host_isr import (host_image_change, normalize_image, open_rgb,
                       pick_shift_direction)


class DarkZurichDataset:
    def __init__(self, root: str, *, split: str = "train",
                 image_resize_size=(960, 540), image_crop_size=(512, 512),
                 isr_params=None, shift_type: str = "rightdown",
                 outputs=("image", "isr"), with_day_pair: bool = False,
                 shift_3_channel: bool = False, auto_threshold: bool = False):
        if auto_threshold:
            # faithful to the reference: dark_zurich_ic.py:194,229 forwards
            # (pil, 'image_gray') into get_image_change_from_pil, which
            # raises 'auto_threshold function not implement！' (utils.py:124)
            raise NotImplementedError(
                "auto_threshold is unimplemented in the reference "
                "(mmseg/datasets/utils.py:124-125) and is not supported")
        self.root = root
        self.split = split
        self.resize = image_resize_size
        self.crop = image_crop_size
        self.outputs = set(outputs)
        self.shift_type = shift_type
        self.with_day_pair = with_day_pair
        self.shift_3_channel = shift_3_channel

        def kw(p):
            return dict(val_range=p.val_range, threshold=p.threshold,
                        clip_range=p.clip_range, shift_pixel=p.shift_pixel)

        if shift_3_channel:
            # per-channel parameter rows, fixed rightdown direction
            # (reference dark_zurich_ic.py:232-240; the deflare+3ch combo
            # is broken in the reference — :195-200 splats the row list —
            # so it is rejected here)
            assert isinstance(isr_params, (list, tuple)) and len(isr_params) == 3
            assert "isr_deflare" not in self.outputs
            self.isr_kw = [kw(p) for p in isr_params]
        else:
            self.isr_kw = kw(isr_params)
        self.files = []
        base = os.path.join(root, "rgb_anon", split, "night")
        if os.path.isdir(base):
            for seq in sorted(os.listdir(base)):
                sdir = os.path.join(base, seq)
                for name in sorted(os.listdir(sdir)):
                    self.files.append(os.path.join(sdir, name))
        self.day_files = []
        day_base = os.path.join(root, "rgb_anon", "train", "day")
        if with_day_pair and os.path.isdir(day_base):
            for seq in sorted(os.listdir(day_base)):
                sdir = os.path.join(day_base, seq)
                for name in sorted(os.listdir(sdir)):
                    self.day_files.append(os.path.join(sdir, name))

    def __len__(self):
        return len(self.files)

    def _label_path(self, image_path):
        return image_path.replace("rgb_anon", "gt").replace(
            "_gt", "_gt_labelTrainIds")

    def load(self, idx: int, rng: random.Random | None = None):
        """``rng``: per-worker random.Random (race-free worker seeding)."""
        r = rng if rng is not None else random
        path = self.files[idx]
        test_mode = self.split != "train"
        out = {}
        img_pil = open_rgb(path).resize(
            self.resize, resample=Image.BILINEAR)
        if not test_mode:
            x = r.randint(0, self.resize[0] - self.crop[0])
            y = r.randint(0, self.resize[1] - self.crop[1])
            flip = r.random() < 0.5
            box = (x, y, x + self.crop[0], y + self.crop[1])

        if "image" in self.outputs:
            img = img_pil
            if not test_mode:
                img = img.crop(box)
                if flip:
                    img = img.transpose(Image.FLIP_LEFT_RIGHT)
            out["image"] = normalize_image(img)

        if "isr" in self.outputs:
            if self.shift_3_channel:
                isr = np.stack([
                    host_image_change(img_pil, shift_direction="rightdown",
                                      **kw) for kw in self.isr_kw], axis=-1)
            else:
                direction = (pick_shift_direction(self.shift_type, x, y)
                             if not test_mode else
                             pick_shift_direction(self.shift_type, 0, 0))
                isr = host_image_change(img_pil, shift_direction=direction,
                                        **self.isr_kw)
            if not test_mode:
                isr = isr[y: y + self.crop[1], x: x + self.crop[0]]
                if flip:
                    isr = np.ascontiguousarray(isr[:, ::-1])
            out["isr"] = (isr if isr.ndim == 3
                          else np.repeat(isr[..., None], 3, axis=-1))

        if "label" in self.outputs:
            lbl_pil = Image.open(self._label_path(path))
            if lbl_pil.size != tuple(self.resize):
                lbl_pil = lbl_pil.resize(self.resize, resample=Image.NEAREST)
            out["label"] = np.asarray(lbl_pil).astype(np.int32)

        if "image_deflare" in self.outputs or "isr_deflare" in self.outputs:
            # flare-removed night frames live beside the originals in a
            # night_deflare tree (reference dark_zurich_ic.py:61-62,181-218)
            df_path = path.replace("night", "night_deflare")
            df_pil = Image.open(df_path).convert("RGB").resize(
                self.resize, resample=Image.BILINEAR)
            if "image_deflare" in self.outputs:
                img = df_pil
                if not test_mode:
                    img = img.crop(box)
                    if flip:
                        img = img.transpose(Image.FLIP_LEFT_RIGHT)
                out["image_deflare"] = normalize_image(img)
            if "isr_deflare" in self.outputs:
                direction = (pick_shift_direction(self.shift_type, x, y)
                             if not test_mode else
                             pick_shift_direction(self.shift_type, 0, 0))
                isr = host_image_change(df_pil, shift_direction=direction,
                                        **self.isr_kw)
                if not test_mode:
                    isr = isr[y: y + self.crop[1], x: x + self.crop[0]]
                    if flip:
                        isr = np.ascontiguousarray(isr[:, ::-1])
                out["isr_deflare"] = np.repeat(isr[..., None], 3, axis=-1)

        if self.with_day_pair and self.day_files and not test_mode:
            didx = r.randint(0, len(self.day_files) - 1)
            day_pil = Image.open(self.day_files[didx]).convert("RGB").resize(
                self.resize, resample=Image.BILINEAR)
            day = day_pil.crop(box)
            if flip:
                day = day.transpose(Image.FLIP_LEFT_RIGHT)
            out["day_image"] = normalize_image(day)
            t_isr_path = self.day_files[didx].replace("day", "day_t_isr")
            if os.path.exists(t_isr_path):
                t_isr = Image.open(t_isr_path).convert("L").crop(
                    (960, 0, 1920, 540)).crop(box)
                if flip:
                    t_isr = t_isr.transpose(Image.FLIP_LEFT_RIGHT)
                arr = (np.asarray(t_isr, np.float32) / 255.0 - 0.5) / 0.5
                out["day_isr"] = np.repeat(arr[..., None], 3, axis=-1)
        return out

    def __getitem__(self, idx):
        return self.load(idx)
