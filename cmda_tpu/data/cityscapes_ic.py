"""CityscapesIC — labeled daytime source domain (image + temporal IC + ISR).

Behavioral contract (reference mmseg/datasets/cityscapes_ic.py:22-272):
  * files: leftImg8bit/train/<city>/*.png; temporal-difference frames in
    leftImg8bit_IC1 (offline, create tools/cityscapes_image_change.py);
    labels gtFine *_labelTrainIds.png.
  * geometry: resize to 1024x512 (PIL bilinear/nearest), random 512x512 crop,
    random horizontal flip — one (x, y, flip) draw shared by all modalities.
  * 'img_time_res' = IC1 PNG -> gray/255 -> (v-0.5)/0.5, 3-channel.
  * 'img_self_res' = on-the-fly ISR of the cropped image; shift direction
    'random' resolves to direct[x % 2][flip] (cityscapes_ic.py:232-234).
  * 'image' normalized by the ImageNet mean/std.

Outputs canonical keys: image (HWC f32), img_time_res (HWC f32),
img_self_res (HWC f32), label (HW i32).
"""
from __future__ import annotations

import os
import random

import numpy as np
from PIL import Image

from .host_isr import host_image_change, normalize_image, pick_shift_direction


class CityscapesICDataset:
    def __init__(self, root: str, *, image_resize_size=(1024, 512),
                 image_crop_size=(512, 512), isr_params=None,
                 shift_type: str = "random",
                 outputs=("image", "img_time_res", "img_self_res", "label"),
                 rcs_file_list=None):
        self.root = root
        self.resize = image_resize_size   # (W, H) PIL convention
        self.crop = image_crop_size
        self.outputs = set(outputs)
        self.shift_type = shift_type
        p = isr_params
        self.isr_kw = dict(val_range=p.val_range, threshold=p.threshold,
                           clip_range=p.clip_range, shift_pixel=p.shift_pixel)
        self.files = []
        img_root = os.path.join(root, "leftImg8bit", "train")
        if rcs_file_list is not None:
            self.files = list(rcs_file_list)
        elif os.path.isdir(img_root):
            for city in sorted(os.listdir(img_root)):
                cdir = os.path.join(img_root, city)
                for name in sorted(os.listdir(cdir)):
                    self.files.append(os.path.join(cdir, name))

    def __len__(self):
        return len(self.files)

    @staticmethod
    def _ic_path(image_path):
        return image_path.replace("leftImg8bit", "leftImg8bit_IC1")[:-8] + ".png"

    @staticmethod
    def _label_path(image_path):
        return image_path.replace("leftImg8bit", "gtFine")[:-4] + "_labelTrainIds.png"

    def load(self, idx: int, crop_xy=None, flip=None):
        """One sample; crop_xy/flip may be forced (Rare Class Sampling
        re-crops, reference uda_dataset.py:89-106)."""
        path = self.files[idx]
        w_max = self.resize[0] - self.crop[0]
        h_max = self.resize[1] - self.crop[1]
        if crop_xy is None:
            crop_xy = (random.randint(0, w_max), random.randint(0, h_max))
        if flip is None:
            flip = random.random() < 0.5
        x, y = crop_xy
        box = (x, y, x + self.crop[0], y + self.crop[1])
        out = {}

        crop_image = None
        if "image" in self.outputs or "img_self_res" in self.outputs:
            img = Image.open(path).convert("RGB").resize(
                self.resize, resample=Image.BILINEAR).crop(box)
            if flip:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            crop_image = img
            if "image" in self.outputs:
                out["image"] = normalize_image(img)

        if "label" in self.outputs:
            lbl = Image.open(self._label_path(path)).resize(
                self.resize, resample=Image.NEAREST).crop(box)
            if flip:
                lbl = lbl.transpose(Image.FLIP_LEFT_RIGHT)
            out["label"] = np.asarray(lbl).astype(np.int32)

        if "img_time_res" in self.outputs:
            ic = Image.open(self._ic_path(path)).convert("L").resize(
                self.resize, resample=Image.BILINEAR).crop(box)
            if flip:
                ic = ic.transpose(Image.FLIP_LEFT_RIGHT)
            arr = (np.asarray(ic, np.float32) / 255.0 - 0.5) / 0.5
            out["img_time_res"] = np.repeat(arr[..., None], 3, axis=-1)

        if "img_self_res" in self.outputs:
            direction = pick_shift_direction(self.shift_type, x, int(flip))
            isr = host_image_change(crop_image, shift_direction=direction,
                                    **self.isr_kw)
            out["img_self_res"] = np.repeat(isr[..., None], 3, axis=-1)

        return out

    def __getitem__(self, idx):
        return self.load(idx)
