"""mmseg-style composable data pipelines (host side).

Covers the reference's pipeline system used by every legacy dataset
(mmseg/datasets/pipelines/: Compose, loading.py LoadImageFromFile /
LoadAnnotations, transforms.py:12-894 Resize / RandomCrop / RandomFlip /
PhotoMetricDistortion / Normalize / Pad, test_time_aug.py MultiScaleFlipAug).

Samples are plain dicts: {'img': HWC float32/uint8, 'gt': HW int32,
'meta': {...}}. Every random transform takes the per-worker
``random.Random`` via sample['rng'] (set by ``Compose(..., rng=...)``) so
pipelines stay deterministic and race-free like the rest of the data layer.
"""
from __future__ import annotations

import random

import numpy as np
from PIL import Image

from .host_isr import IMAGENET_MEAN, IMAGENET_STD


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample: dict, rng: random.Random | None = None):
        sample = dict(sample)
        sample.setdefault("rng", rng if rng is not None else random)
        for t in self.transforms:
            sample = t(sample)
            if sample is None:
                return None
        sample.pop("rng", None)
        return sample

    def __repr__(self):
        return f"Compose({[type(t).__name__ for t in self.transforms]})"


class LoadImageFromFile:
    def __call__(self, s):
        img = Image.open(s["img_path"]).convert("RGB")
        s["img"] = np.asarray(img, np.float32)
        s.setdefault("meta", {})["ori_shape"] = s["img"].shape
        return s


class LoadAnnotations:
    def __call__(self, s):
        s["gt"] = np.asarray(Image.open(s["gt_path"])).astype(np.int32)
        return s


def _pil_resize(arr, size_wh, nearest=False):
    mode = Image.NEAREST if nearest else Image.BILINEAR
    if arr.dtype != np.uint8 and not nearest:
        pil = Image.fromarray(arr.astype(np.float32), mode="F") \
            if arr.ndim == 2 else None
        if pil is None:
            chans = [Image.fromarray(arr[..., c].astype(np.float32),
                                     mode="F").resize(size_wh, mode)
                     for c in range(arr.shape[-1])]
            return np.stack([np.asarray(c, np.float32) for c in chans], -1)
        return np.asarray(pil.resize(size_wh, mode), np.float32)
    pil = Image.fromarray(arr.astype(np.uint8) if not nearest
                          else arr.astype(np.uint8))
    out = np.asarray(pil.resize(size_wh, mode))
    return out.astype(arr.dtype)


class Resize:
    """img_scale (W, H); ratio_range draws a scale factor U(lo, hi);
    keep_ratio rescales the long edge (mmseg Resize semantics,
    transforms.py:12-208)."""

    def __init__(self, img_scale, ratio_range=None, keep_ratio=True):
        self.img_scale = img_scale
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio

    def __call__(self, s):
        r = s["rng"]
        w, h = self.img_scale
        if self.ratio_range is not None:
            ratio = r.uniform(*self.ratio_range)
            w, h = int(w * ratio + 0.5), int(h * ratio + 0.5)
        if self.keep_ratio:
            ih, iw = s["img"].shape[:2]
            scale = min(w / iw, h / ih)
            w, h = int(iw * scale + 0.5), int(ih * scale + 0.5)
        s["img"] = _pil_resize(s["img"], (w, h))
        if "gt" in s:
            s["gt"] = _pil_resize(s["gt"], (w, h), nearest=True
                                  ).astype(np.int32)
        s.setdefault("meta", {})["img_shape"] = s["img"].shape
        return s


class RandomCrop:
    """crop_size (H, W); redraw up to 10x until no class occupies more than
    cat_max_ratio of the crop (transforms.py RandomCrop.cat_max_ratio)."""

    def __init__(self, crop_size, cat_max_ratio=1.0, ignore_index=255):
        self.crop_size = crop_size
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index

    def _bbox(self, r, shape):
        ch, cw = self.crop_size
        y = r.randint(0, max(shape[0] - ch, 0))
        x = r.randint(0, max(shape[1] - cw, 0))
        return y, x, y + ch, x + cw

    def __call__(self, s):
        r = s["rng"]
        box = self._bbox(r, s["img"].shape)
        if self.cat_max_ratio < 1.0 and "gt" in s:
            for _ in range(10):
                gt = s["gt"][box[0]:box[2], box[1]:box[3]]
                labels, counts = np.unique(gt, return_counts=True)
                counts = counts[labels != self.ignore_index]
                if len(counts) > 1 and counts.max() / counts.sum() \
                        < self.cat_max_ratio:
                    break
                box = self._bbox(r, s["img"].shape)
        s["img"] = s["img"][box[0]:box[2], box[1]:box[3]]
        if "gt" in s:
            s["gt"] = s["gt"][box[0]:box[2], box[1]:box[3]]
        return s


class RandomFlip:
    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, s):
        if s["rng"].random() < self.prob:
            s["img"] = np.ascontiguousarray(s["img"][:, ::-1])
            if "gt" in s:
                s["gt"] = np.ascontiguousarray(s["gt"][:, ::-1])
            s.setdefault("meta", {})["flip"] = True
        return s


class PhotoMetricDistortion:
    """brightness/contrast/saturation/hue jitter on uint8-range images
    (transforms.py PhotoMetricDistortion: each applied with p=0.5,
    contrast-first or -last coin)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    @staticmethod
    def _rgb_to_hsv(img):
        maxc = img.max(-1)
        minc = img.min(-1)
        v = maxc
        delta = maxc - minc
        s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-8), 0)
        dr = np.where(delta > 0, delta, 1)
        rc = (maxc - img[..., 0]) / dr
        gc = (maxc - img[..., 1]) / dr
        bc = (maxc - img[..., 2]) / dr
        h = np.where(maxc == img[..., 0], bc - gc,
                     np.where(maxc == img[..., 1], 2 + rc - bc, 4 + gc - rc))
        h = np.where(delta > 0, (h / 6.0) % 1.0, 0.0)
        return np.stack([h, s, v], -1)

    @staticmethod
    def _hsv_to_rgb(hsv):
        h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
        i = np.floor(h * 6).astype(int) % 6
        f = h * 6 - np.floor(h * 6)
        p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
        out = np.select(
            [(i == k)[..., None] for k in range(6)],
            [np.stack([v, t, p], -1), np.stack([q, v, p], -1),
             np.stack([p, v, t], -1), np.stack([p, q, v], -1),
             np.stack([t, p, v], -1), np.stack([v, p, q], -1)])
        return out

    def __call__(self, s):
        r = s["rng"]
        img = s["img"].astype(np.float32)
        if r.random() < 0.5:
            img = img + r.uniform(-self.brightness_delta,
                                  self.brightness_delta)
        contrast_last = r.random() < 0.5
        if not contrast_last and r.random() < 0.5:
            img = img * r.uniform(*self.contrast_range)
        hsv = self._rgb_to_hsv(np.clip(img, 0, 255) / 255.0)
        if r.random() < 0.5:
            hsv[..., 1] = np.clip(
                hsv[..., 1] * r.uniform(*self.saturation_range), 0, 1)
        if r.random() < 0.5:
            hsv[..., 0] = (hsv[..., 0]
                           + r.uniform(-self.hue_delta, self.hue_delta)
                           / 360.0) % 1.0
        img = self._hsv_to_rgb(hsv) * 255.0
        if contrast_last and r.random() < 0.5:
            img = img * r.uniform(*self.contrast_range)
        s["img"] = np.clip(img, 0, 255).astype(np.float32)
        return s


class Normalize:
    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, s):
        s["img"] = (s["img"].astype(np.float32) - self.mean) / self.std
        return s


class Pad:
    def __init__(self, size=None, size_divisor=None, pad_val=0,
                 seg_pad_val=255):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val

    def __call__(self, s):
        h, w = s["img"].shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = -(-h // d) * d, -(-w // d) * d
        ph, pw = max(th - h, 0), max(tw - w, 0)
        if ph or pw:
            s["img"] = np.pad(s["img"], ((0, ph), (0, pw), (0, 0)),
                              constant_values=self.pad_val)
            if "gt" in s:
                s["gt"] = np.pad(s["gt"], ((0, ph), (0, pw)),
                                 constant_values=self.seg_pad_val)
        return s


class MultiScaleFlipAug:
    """Test-time wrapper: produce one transformed variant per (scale, flip)
    (reference test_time_aug.py). ``transforms`` run after the scale/flip;
    returns a LIST of samples with meta['scale']/meta['flip']."""

    def __init__(self, img_scale, scales=(1.0,), flip=False, transforms=()):
        self.img_scale = img_scale
        self.scales = scales
        self.flip = flip
        self.post = Compose(transforms)

    def __call__(self, sample, rng=None):
        outs = []
        w, h = self.img_scale
        for sc in self.scales:
            for do_flip in ([False, True] if self.flip else [False]):
                s = {k: (np.copy(v) if isinstance(v, np.ndarray) else v)
                     for k, v in sample.items()}
                sw, sh = int(w * sc + 0.5), int(h * sc + 0.5)
                s["img"] = _pil_resize(s["img"], (sw, sh))
                if "gt" in s:
                    s["gt"] = _pil_resize(s["gt"], (sw, sh), nearest=True
                                          ).astype(np.int32)
                if do_flip:
                    s["img"] = np.ascontiguousarray(s["img"][:, ::-1])
                s.setdefault("meta", {})
                s["meta"] = dict(s["meta"], scale=sc, flip=do_flip)
                outs.append(self.post(s, rng))
        return outs
