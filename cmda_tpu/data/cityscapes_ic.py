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

from .host_isr import (host_image_change, normalize_image, open_rgb,
                       pick_shift_direction)


class CityscapesICDataset:
    def __init__(self, root: str, *, image_resize_size=(1024, 512),
                 image_crop_size=(512, 512), isr_params=None,
                 shift_type: str = "random",
                 outputs=("image", "img_time_res", "img_self_res", "label"),
                 rcs_file_list=None,
                 isr_noise: bool = False, isr_cow_mask: bool = False,
                 flare_dir: str | None = None,
                 sky_noise_dir: str | None = None, sky_mask: bool = False,
                 shift_3_channel: bool = False,
                 high_resolution_isr: bool = False,
                 return_gi_or_ic: str = "image_change",
                 decode_cache: int = 0):
        """Source-ISR augmentation knobs mirror the reference dataset
        (cityscapes_ic.py:38-45, 243-336): ``isr_noise`` blur+speckle,
        ``isr_cow_mask`` CowMix erase, ``flare_dir`` lens-flare composite
        onto the image crop, ``sky_mask`` sky-region noise splice
        (texture PNGs from ``sky_noise_dir`` when given),
        ``shift_3_channel`` 3-channel multi-scale ISR — ``isr_params``
        must then be a sequence of 3 param sets (cityscapes_ic.py:99-110)."""
        self.root = root
        self.resize = image_resize_size   # (W, H) PIL convention
        self.crop = image_crop_size
        self.outputs = set(outputs)
        self.shift_type = shift_type
        self.isr_noise = isr_noise
        self.isr_cow_mask = isr_cow_mask
        self.flare_dir = flare_dir
        self.sky_noise_dir = sky_noise_dir
        self.sky_mask = sky_mask or sky_noise_dir is not None
        self.shift_3_channel = shift_3_channel
        self.high_resolution_isr = high_resolution_isr
        assert not (shift_3_channel and high_resolution_isr)
        # img_time_res source: 'image_change'/'ic_wo_cyclegan' = IC1 PNG,
        # 'gray_image' = the frame itself, 'events_gan'/'events_esim' =
        # precomputed simulated-events PNGs (reference cityscapes_ic.py:176-205,
        # my_run_experiments.py:189-210)
        assert return_gi_or_ic in ("image_change", "ic_wo_cyclegan",
                                   "gray_image", "events_gan", "events_esim")
        self.return_gi_or_ic = return_gi_or_ic
        # LRU over the decoded+fixed-resized base frames (image/label/IC);
        # crop/flip/augment/ISR are per-draw and happen downstream, so the
        # cache is semantically transparent (data/cache.py)
        from .cache import DecodeCache
        self._cache = DecodeCache(decode_cache)

        def kw(p):
            return dict(val_range=p.val_range, threshold=p.threshold,
                        clip_range=p.clip_range, shift_pixel=p.shift_pixel)

        if shift_3_channel:
            assert isinstance(isr_params, (list, tuple)) and len(isr_params) == 3
            self.isr_kw = [kw(p) for p in isr_params]
        else:
            self.isr_kw = kw(isr_params)
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

    def load(self, idx: int, crop_xy=None, flip=None,
             rng: random.Random | None = None):
        """One sample; crop_xy/flip may be forced (Rare Class Sampling
        re-crops, reference uda_dataset.py:89-106). ``rng`` is the
        per-worker random.Random (race-free mirror of the reference's
        worker seeding, builder.py:180-194)."""
        r = rng if rng is not None else random
        path = self.files[idx]
        w_max = self.resize[0] - self.crop[0]
        h_max = self.resize[1] - self.crop[1]
        if crop_xy is None:
            crop_xy = (r.randint(0, w_max), r.randint(0, h_max))
        if flip is None:
            flip = r.random() < 0.5
        x, y = crop_xy
        box = (x, y, x + self.crop[0], y + self.crop[1])
        out = {}

        crop_image = None
        if "image" in self.outputs or "img_self_res" in self.outputs:
            img = self._cache.get(("img", path), lambda: open_rgb(path).resize(
                self.resize, resample=Image.BILINEAR)).crop(box)
            if flip:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            if self.flare_dir is not None:
                from .source_augs import flare_transform_np
                img = flare_transform_np(img, self.flare_dir, r)
            crop_image = img
            if "image" in self.outputs:
                out["image"] = normalize_image(img)

        label_arr = None
        if "label" in self.outputs or self.sky_mask:
            lbl = self._cache.get(
                ("lbl", path),
                lambda: Image.open(self._label_path(path)).resize(
                    self.resize, resample=Image.NEAREST)).crop(box)
            if flip:
                lbl = lbl.transpose(Image.FLIP_LEFT_RIGHT)
            label_arr = np.asarray(lbl).astype(np.int32)
            if "label" in self.outputs:
                out["label"] = label_arr

        if "img_time_res" in self.outputs:
            mode = self.return_gi_or_ic

            def load_ic():
                if mode == "gray_image":
                    ic = Image.open(path).convert("L")
                elif mode == "events_gan":
                    p = path.replace("leftImg8bit",
                                     "leftImg8bit_EventGAN")[:-13] + ".png"
                    ic = Image.open(p).convert("L")
                elif mode == "events_esim":
                    p = path.replace("leftImg8bit",
                                     "leftImg8bit_esim")[:-13] + ".png"
                    ic = Image.open(p).convert("L")
                else:
                    ic = Image.open(self._ic_path(path)).convert("L")
                if mode != "events_esim":   # esim PNGs are already crop-res
                    ic = ic.resize(self.resize, resample=Image.BILINEAR)
                return ic

            ic = self._cache.get(("ic", mode, path), load_ic).crop(box)
            if flip:
                ic = ic.transpose(Image.FLIP_LEFT_RIGHT)
            arr = (np.asarray(ic, np.float32) / 255.0 - 0.5) / 0.5
            out["img_time_res"] = np.broadcast_to(arr[..., None],
                                                  arr.shape + (3,))

        if "img_self_res" in self.outputs:
            if self.high_resolution_isr:
                # ISR on the RAW full-res frame with 2x shift, then
                # nearest-downsampled and cropped (reference
                # cityscapes_ic.py:212-223)
                raw = self._cache.get(("raw", path), lambda: open_rgb(path))
                kw2 = dict(self.isr_kw, shift_pixel=self.isr_kw["shift_pixel"] * 2)
                isr_full = host_image_change(raw, shift_direction="rightdown",
                                             **kw2)
                ys = (np.arange(self.resize[1]) * isr_full.shape[0]
                      // self.resize[1])
                xs = (np.arange(self.resize[0]) * isr_full.shape[1]
                      // self.resize[0])
                isr = isr_full[np.ix_(ys, xs)]
                isr = isr[y: y + self.crop[1], x: x + self.crop[0]]
                if flip:
                    isr = np.ascontiguousarray(isr[:, ::-1])
            elif self.shift_3_channel:
                # 3-channel multi-scale ISR, default rightdown direction
                # (reference cityscapes_ic.py:99-110, 225-231)
                isr = np.stack([
                    host_image_change(crop_image, shift_direction="rightdown",
                                      **kw) for kw in self.isr_kw], axis=-1)
            else:
                direction = pick_shift_direction(self.shift_type, x, int(flip))
                isr = host_image_change(crop_image, shift_direction=direction,
                                        **self.isr_kw)
            if self.sky_mask and label_arr is not None and isr.ndim == 2:
                from .source_augs import sky_mask_transform_np
                isr = sky_mask_transform_np(isr, label_arr, r,
                                            noise_dir=self.sky_noise_dir)
            if self.isr_noise:
                from .source_augs import isr_noise_np
                if isr.ndim == 2:
                    isr = isr_noise_np(isr, r)
                else:
                    isr = np.stack([isr_noise_np(isr[..., i], r)
                                    for i in range(isr.shape[-1])], axis=-1)
            if self.isr_cow_mask:
                from .source_augs import cow_mask_np
                mask = cow_mask_np(isr.shape[:2], r)
                isr = isr * (mask if isr.ndim == 2 else mask[..., None])
            if isr.ndim == 2:
                isr = np.broadcast_to(isr[..., None], isr.shape + (3,))
            out["img_self_res"] = isr.astype(np.float32, copy=False)

        return out

    def __getitem__(self, idx):
        return self.load(idx)
