"""DSEC-Night — unlabeled nighttime target domain (warped image + real
events + real-time ISR); labeled test split.

Behavioral contract (reference mmseg/datasets/dsec.py:125-384 + SURVEY §3.5):
  * index file: one line per sample "<image_path> <events_finish_index>";
    events slice [start, finish] where start is the finish index of the frame
    ``image_change_range`` (=1) frames back (images_to_events_index.txt).
  * train geometry: one (x, y in 640x480, flip) draw; warp_image crop
    (400x400) -> flip -> resize 512x512 PIL-bilinear; events voxel grid
    (bins=1) built at 480x640 from rectified coords, adaptively normalized
    (clip = n_events/5e5*1.5), then crop/flip + torch-bilinear resize; ISR
    computed real-time from the *uncropped-then-cropped* warped PIL image.
  * test geometry: full frames cropped to the top 440 rows; labels
    <seq>_<idx>_grey_gtFine_labelTrainIds.png [:440].

The events decode path needs hdf5plugin (DSEC events.h5 chunks are
compressed); when unavailable we raise at use with a clear message — the
C++ ingest (cmda_tpu/native) is the production path.

Outputs canonical keys: image, events, isr (HWC f32), label (HW i32),
meta (test mode).
"""
from __future__ import annotations

import os
import random

import numpy as np
from PIL import Image

from .host_isr import (host_image_change, normalize_image, open_rgb,
                       pick_shift_direction)

try:  # pragma: no cover - environment dependent
    import hdf5plugin  # noqa: F401  (registers codecs)
except ImportError:
    pass
try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def host_voxel_grid(t, x, y, p, width, height, num_bins):
    """numpy twin of ops.voxel.events_to_voxel_grid (golden-tested)."""
    grid = np.zeros((num_bins, height, width), np.float32)
    if len(t) == 0:
        return grid
    denom = t[-1] - t[0]
    t_norm = (num_bins - 1) * (t - t[0]) / (denom if denom != 0 else 1.0)
    x0, y0, t0 = x.astype(np.int32), y.astype(np.int32), t_norm.astype(np.int32)
    value = 2.0 * p - 1.0
    flat = grid.reshape(-1)
    for dx in (0, 1):
        for dy in (0, 1):
            for dt in (0, 1):
                xl, yl, tl = x0 + dx, y0 + dy, t0 + dt
                m = ((xl >= 0) & (xl < width) & (yl >= 0) & (yl < height)
                     & (tl >= 0) & (tl < num_bins))
                w = (value * (1 - np.abs(xl - x)) * (1 - np.abs(yl - y))
                     * (1 - np.abs(tl - t_norm)))
                idx = height * width * tl + width * yl + xl
                np.add.at(flat, idx[m], w[m])
    return grid


def host_events_norm(grid, clip_range, final_range=1.0):
    """numpy twin of ops.voxel.events_norm (enforce_no_events_zero path)."""
    nz = grid != 0
    n = nz.sum()
    if n > 0:
        mean = grid.sum() / n
        std = np.sqrt(max((grid ** 2).sum() / n - mean ** 2, 0.0))
        grid = np.where(nz, (grid - mean) / (std + 1e-8), 0.0).astype(np.float32)

    def norm(xx, lo, hi):
        mn, mx = xx.min(), xx.max()
        return (xx - mn) / (mx - mn + 1e-8) * (hi - lo) + lo

    pos = norm(np.clip(np.maximum(grid, 0), 0, clip_range), 0, final_range)
    neg = norm(np.clip(np.minimum(grid, 0), -clip_range, 0), -final_range, 0)
    return pos + neg


class DSECDataset:
    HEIGHT, WIDTH = 480, 640

    def __init__(self, dataset_txt_path: str, *, events_bins: int = 1,
                 crop_size=(400, 400), after_crop_resize_size=(512, 512),
                 image_change_range: int = 1, isr_params=None,
                 shift_type: str = "random", test_mode: bool = False,
                 events_clip_range=None, decode_cache: int = 0,
                 outputs=("image", "events", "isr")):
        self.txt_path = dataset_txt_path
        self.events_bins = events_bins
        self.crop = crop_size                  # (W, H) in train mode
        self.resize = after_crop_resize_size   # (W, H)
        self.image_change_range = image_change_range
        # fixed clip override: uniform(lo, hi) instead of the adaptive
        # (n/5e5)*1.5 rule (reference dsec.py:359-362)
        self.events_clip_range = events_clip_range
        self.test_mode = test_mode
        self.outputs = set(outputs)
        self.shift_type = shift_type
        p = isr_params
        self.isr_kw = dict(val_range=p.val_range, threshold=p.threshold,
                           clip_range=p.clip_range, shift_pixel=p.shift_pixel)
        self.rows = (np.loadtxt(dataset_txt_path, dtype=str, encoding="utf-8")
                     if os.path.exists(dataset_txt_path) else np.zeros((0, 2), str))
        if self.rows.ndim == 1 and self.rows.size:
            self.rows = self.rows[None]
        self._h5_cache = {}
        import threading
        # one lock per dataset instance: serializes libhdf5 calls on the
        # shared File handles across loader worker threads (a transient
        # H5Dread_chunk RuntimeError killed a 10k-iter r5 run otherwise)
        self._h5_lock = threading.Lock()
        # immutable side tables, re-read per draw otherwise: the per-sequence
        # events-index txt (np.loadtxt of thousands of str rows) and the
        # rectify map (full-array h5 decompress) — memoized unconditionally
        self._index_cache = {}
        self._rect_cache = {}
        from .cache import DecodeCache
        self._cache = DecodeCache(decode_cache)   # decoded warp frames (LRU)

    def __len__(self):
        return len(self.rows)

    # ---------------- events ----------------
    def _open_h5(self, path):
        if h5py is None:
            raise RuntimeError("h5py unavailable — use the C++ ingest")
        with self._h5_lock:
            if path not in self._h5_cache:
                self._h5_cache[path] = h5py.File(path, "r")
            return self._h5_cache[path]

    def _splat_grid(self, image_path, finish, start):
        """UN-normalized full-res voxel grid [bins,H,W] — deterministic given
        (events file, window), so it is cached by the decode LRU; the random
        part of the draw (clip, crop, flip, resize) happens after."""
        ev_path = image_path.replace("images", "events")[:-20] + "events.h5"
        h5 = self._open_h5(ev_path)
        from .native_h5 import read_slice
        lk = self._h5_lock
        t = read_slice(h5["events/t"], start, finish + 1, lock=lk)
        x = read_slice(h5["events/x"], start, finish + 1, lock=lk)
        y = read_slice(h5["events/y"], start, finish + 1, lock=lk)
        p = read_slice(h5["events/p"], start, finish + 1,
                       lock=lk).astype(np.float32)
        t = (t - t[0]).astype(np.float32)
        if t[-1] > 0:
            t = t / t[-1]
        rect_path = image_path.replace("images", "events")[:-20] + "rectify_map.h5"
        if rect_path not in self._rect_cache:
            self._rect_cache[rect_path] = (
                np.asarray(self._open_h5(rect_path)["rectify_map"])
                if os.path.exists(rect_path) else None)
        rmap = self._rect_cache[rect_path]
        if rmap is not None:
            xy = rmap[y, x]
            x, y = xy[:, 0].astype(np.float32), xy[:, 1].astype(np.float32)
        else:
            x, y = x.astype(np.float32), y.astype(np.float32)
        from .. import native
        if native.available():
            return native.voxel_grid(t, x, y, p, bins=self.events_bins,
                                     height=self.HEIGHT, width=self.WIDTH)
        return host_voxel_grid(t, x, y, p, self.WIDTH, self.HEIGHT,
                               self.events_bins)

    def _events_grid(self, image_path, finish, start, rng=None):
        grid = self._cache.get(
            ("grid", image_path, start, finish),
            lambda: self._splat_grid(image_path, finish, start))
        if self.events_clip_range is not None:
            lo, hi = self.events_clip_range
            clip = (rng if rng is not None else random).uniform(lo, hi)
        else:
            clip = (finish - start) / 500000.0 * 1.5
        from .. import native
        if native.available():
            return native.events_norm(grid, clip)
        return host_events_norm(grid.copy(), clip)

    # ---------------- samples ----------------
    def load(self, idx: int, rng: random.Random | None = None):
        """``rng`` is the per-worker random.Random (deterministic, race-free
        mirror of the reference's worker_init_fn seeding, builder.py:180-194);
        falls back to the module RNG for ad-hoc single-threaded use."""
        r = rng if rng is not None else random
        image_path = str(self.rows[idx][0])
        now_index = int(os.path.basename(image_path).split(".")[0])
        out = {}
        if not self.test_mode:
            flip = r.random() < 0.5
            x = r.randint(0, self.WIDTH - self.crop[0])
            y = r.randint(0, self.HEIGHT - self.crop[1])
            box = (x, y, x + self.crop[0], y + self.crop[1])

        warp_path = image_path.replace("images/left/rectified", "warp_images")
        warp_pil = self._cache.get(("warp", warp_path),
                                   lambda: open_rgb(warp_path))

        if "image" in self.outputs:
            if self.test_mode:
                out["image"] = normalize_image(warp_pil)[:440]
            else:
                img = warp_pil.crop(box)
                if flip:
                    img = img.transpose(Image.FLIP_LEFT_RIGHT)
                img = img.resize(self.resize, resample=Image.BILINEAR)
                warp_crop_pil = img
                out["image"] = normalize_image(img)

        if "isr" in self.outputs:
            if self.test_mode:
                src_pil, a, b = warp_pil, 0, 0
            else:
                src_pil, a, b = warp_crop_pil, x, y
            direction = pick_shift_direction(self.shift_type, a, b)
            isr = host_image_change(src_pil, shift_direction=direction,
                                    **self.isr_kw)
            if self.test_mode:
                isr = isr[:440]
            # read-only broadcast view; the collate stack materializes it
            out["isr"] = np.broadcast_to(isr[..., None], isr.shape + (3,))

        if "events" in self.outputs:
            idx_file = os.path.join(
                image_path.split("left/rectified")[0],
                "images_to_events_index.txt")
            if idx_file not in self._index_cache:
                self._index_cache[idx_file] = np.loadtxt(
                    idx_file, dtype=str, encoding="utf-8")
            index_map = self._index_cache[idx_file]
            finish = int(index_map[now_index])
            start = int(index_map[now_index - self.image_change_range])
            grid = self._events_grid(image_path, finish, start,
                                     rng=r)  # [bins,H,W]
            ev = grid[0] if self.events_bins == 1 else grid.mean(0)
            if self.test_mode:
                ev = ev[:440]
            else:
                ev = ev[y: y + self.crop[1], x: x + self.crop[0]]
                if flip:
                    ev = ev[:, ::-1]
                ev = _bilinear_resize_np(ev, (self.resize[1], self.resize[0]))
            ev = np.ascontiguousarray(ev)
            out["events"] = np.broadcast_to(ev[..., None], ev.shape + (3,))

        if "label" in self.outputs:
            seq = image_path.split("/")[-5]
            lbl_path = "{}labels/{}_{:06d}_grey_gtFine_labelTrainIds.png".format(
                image_path.split("images/left/rectified")[0], seq, now_index)
            lbl = np.asarray(Image.open(lbl_path)).astype(np.int32)
            out["label"] = lbl[:440]
        return out

    def __getitem__(self, idx):
        return self.load(idx)


def _bilinear_resize_np(arr2d, out_hw):
    """align_corners=False bilinear (torch semantics) on a 2-D array.

    Routes through torch's CPU kernel when available (the reference resizes
    events with torch bilinear, dsec.py:365-369; torch's AVX kernel is ~8x
    the numpy gather chain below, which remains as the fallback/oracle)."""
    h, w = arr2d.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return arr2d.astype(np.float32)
    try:
        import torch
        import torch.nn.functional as F
        t = torch.from_numpy(np.ascontiguousarray(arr2d, np.float32))
        out = F.interpolate(t[None, None], size=(oh, ow), mode="bilinear",
                            align_corners=False)
        return out[0, 0].numpy()
    except Exception:
        # fall through to the numpy oracle on ANY torch failure (absent,
        # present-but-broken install, op-time error). The two backends may
        # differ in the last float bit; tests compare with tolerance.
        pass
    ys = (np.arange(oh) + 0.5) * h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None]
    wx = np.clip(xs - x0, 0, 1)[None, :]
    a = arr2d[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
    b = arr2d[np.ix_(y0, x1)] * (1 - wy) * wx
    c = arr2d[np.ix_(y1, x0)] * wy * (1 - wx)
    d = arr2d[np.ix_(y1, x1)] * wy * wx
    return (a + b + c + d).astype(np.float32)
