"""Synthetic source/target datasets with the real datasets' interfaces.

Used by tests, the bench harness, and end-to-end pipeline smoke runs when the
Cityscapes/DSEC/DarkZurich corpora are not mounted. Shapes, dtypes, value
ranges, and output keys match the real loaders (normalized images, [-1, 1]
ISR/events, int32 labels with 255 ignore)."""
from __future__ import annotations

import numpy as np


class SyntheticSource:
    """CityscapesIC stand-in: image / img_time_res / img_self_res / label."""

    def __init__(self, *, crop_size=(512, 512), num_classes: int = 19,
                 length: int = 64, seed: int = 0, with_time_res: bool = True):
        self.h, self.w = crop_size[1], crop_size[0]
        self.num_classes = num_classes
        self.length = length
        self.seed = seed
        self.with_time_res = with_time_res
        self.files = [f"synthetic_{i:06d}_leftImg8bit.png" for i in range(length)]

    def __len__(self):
        return self.length

    def load(self, idx, crop_xy=None, flip=None, rng=None):
        g = np.random.default_rng(self.seed * 100003 + idx)
        img = g.normal(size=(self.h, self.w, 3)).astype(np.float32)
        label = g.integers(0, self.num_classes,
                           size=(self.h, self.w)).astype(np.int32)
        label[g.random(size=label.shape) < 0.05] = 255
        out = {
            "image": img,
            "img_self_res": np.clip(
                g.normal(size=(self.h, self.w, 1)), -1, 1
            ).astype(np.float32).repeat(3, axis=-1),
            "label": label,
        }
        if self.with_time_res:
            out["img_time_res"] = np.clip(
                g.normal(size=(self.h, self.w, 1)), -1, 1
            ).astype(np.float32).repeat(3, axis=-1)
        return out

    def __getitem__(self, idx):
        return self.load(idx)


class SyntheticTarget:
    """DSEC/DarkZurich stand-in: image / events / isr (+ label in test)."""

    def __init__(self, *, crop_size=(512, 512), length: int = 64,
                 seed: int = 1, with_events: bool = True,
                 test_mode: bool = False, num_classes: int = 19):
        self.h, self.w = crop_size[1], crop_size[0]
        self.length = length
        self.seed = seed
        self.with_events = with_events
        self.test_mode = test_mode
        self.num_classes = num_classes

    def __len__(self):
        return self.length

    def load(self, idx, rng=None):
        g = np.random.default_rng(self.seed * 100003 + idx)
        out = {
            "image": g.normal(size=(self.h, self.w, 3)).astype(np.float32),
            "isr": np.clip(g.normal(size=(self.h, self.w, 1)), -1, 1
                           ).astype(np.float32).repeat(3, axis=-1),
        }
        if self.with_events:
            ev = np.clip(g.normal(size=(self.h, self.w, 1)), -1, 1)
            ev[np.abs(ev) < 0.8] = 0.0
            out["events"] = ev.astype(np.float32).repeat(3, axis=-1)
        if self.test_mode:
            out["label"] = g.integers(0, self.num_classes,
                                      size=(self.h, self.w)).astype(np.int32)
        return out

    def __getitem__(self, idx):
        return self.load(idx)


def _blob_labels(g, h, w, num_classes, cell=8):
    """Piecewise-constant 'scene': low-res random classes, nearest-upsampled."""
    lo = g.integers(0, num_classes, size=(h // cell + 1, w // cell + 1))
    return np.repeat(np.repeat(lo, cell, 0), cell, 1)[:h, :w].astype(np.int32)


def _edge_map(label):
    """Signed class-boundary map — the shared 'events' modality analogue."""
    e = np.zeros(label.shape, np.float32)
    e[:, 1:][label[:, 1:] != label[:, :-1]] = 1.0
    e[1:, :][label[1:, :] != label[:-1, :]] = -1.0
    return e


class LearnableScenes:
    """LEARNABLE synthetic UDA pair (the convergence demo, VERDICT r1
    item 5): scenes are blobby class maps rendered through a fixed
    class->color palette. The SOURCE domain is bright; the TARGET domain
    is the same renderer darkened 4x with extra noise (the day->night
    analogue), so a source-only model degrades on target while the UDA
    objective (teacher pseudo-labels on the domain-robust edge modality +
    ClassMix) can adapt. Mirrors the real datasets' output interfaces."""

    def __init__(self, *, domain: str, crop_size=(64, 64), length: int = 200,
                 num_classes: int = 19, seed: int = 7,
                 test_mode: bool = False, noise: float = 0.05):
        self.h, self.w = crop_size[1], crop_size[0]
        self.domain = domain          # 'source' | 'target'
        self.length = length
        self.num_classes = num_classes
        self.seed = seed
        self.test_mode = test_mode
        self.noise = noise
        gp = np.random.default_rng(12345)   # palette shared across domains
        self.palette = gp.uniform(0.2, 1.0, size=(num_classes, 3))

    def __len__(self):
        return self.length

    def load(self, idx, rng=None):
        g = np.random.default_rng(self.seed * 999983 + idx)
        label = _blob_labels(g, self.h, self.w, self.num_classes)
        base = self.palette[label]
        if self.domain == "target":
            img = base * 0.25 + g.normal(scale=2 * self.noise,
                                         size=base.shape)
        else:
            img = base + g.normal(scale=self.noise, size=base.shape)
        img = ((img - 0.5) / 0.5).astype(np.float32)
        edge = _edge_map(label) + g.normal(
            scale=self.noise, size=label.shape).astype(np.float32)
        edge3 = np.clip(edge, -1, 1)[..., None].repeat(3, -1).astype(
            np.float32)
        out = {"image": img, }
        if self.domain == "source":
            out.update(img_self_res=edge3, img_time_res=edge3, label=label)
        else:
            out.update(isr=edge3, events=edge3)
            if self.test_mode:
                out["label"] = label
        return out

    def __getitem__(self, idx):
        return self.load(idx)
